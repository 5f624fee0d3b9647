package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.{Fs, SnapshotTable}

/** Unified maintenance surface for the EPOCH-KEYED MONITOR STORES a
  * long-lived pipeline accumulates (the `IndexCatalog.toDF` pattern,
  * applied to the sketch-store family): Misra–Gries heavy hitters, KLL
  * quantiles, HLL distinct, the deterministic reservoir sample, and the
  * quality ledger each persist per-epoch state under a store directory
  * with their own fold knobs — this object inventories and bounds ALL
  * of them through one entry point.
  *
  * Every incremental writer self-describes its store on first append: a
  * small `_graft_store.json` descriptor (family, key columns, the
  * family's fold parameter — MG capacity / KLL and reservoir k / HLL
  * lgK) lands next to the data tables, so [[describe]] can inventory a
  * whole TREE of stores and [[compact]] can run each family's
  * consolidating fold WITHOUT the caller re-supplying construction
  * parameters. A store predating the descriptor (or written by an
  * older version) is still detected by its table layout and described;
  * [[compact]] folds it only when the family needs no parameter
  * (HLL union, ledger sum) and reports it as skipped otherwise —
  * folding an MG/KLL store with a GUESSED capacity would silently
  * widen its envelope, which is exactly the kind of quiet degradation
  * this surface exists to prevent.
  *
  * Scale shape: one bounded scan per store (epoch ids are bounded by
  * the fold cap on any store that folds; `n_rows` is one count), no
  * driver collect beyond the per-store epoch-id list, and the
  * directory walk touches only filesystem metadata. Nothing here
  * reads data rows into the driver.
  */
object Stores {

  /** Descriptor file written once per store by the incremental
    * writers. Lives NEXT TO the store's tables (inside `storeDir`), so
    * a store directory is self-contained and survives a rename/move. */
  private[graft] val DescriptorFile = "_graft_store.json"

  /** The six monitor-store families this surface maintains. */
  private[graft] val Families =
    Seq("heavy_hitters", "quantiles", "distinct", "reservoir",
      "quality_ledger", "fingerprint")

  /** Family → the SnapshotTable (under the store dir) that carries the
    * epoch-keyed data rows and defines the store's epoch set. */
  private val DataTable = Map(
    "heavy_hitters" -> "counters",
    "quantiles" -> "items",
    "distinct" -> "sketches",
    "reservoir" -> "rows",
    "quality_ledger" -> "items",
    "fingerprint" -> "items")

  private case class Descriptor(
      family: String,
      keyCols: Seq[String],
      param: Option[Int])

  private def descriptorPath(storeDir: String): String =
    s"$storeDir/$DescriptorFile"

  /** Register a store's identity on first append (called by every
    * incremental writer; one `exists` probe per batch, the
    * fold-watermark discipline). Idempotent: an existing descriptor is
    * never rewritten — a store's construction parameters are fixed at
    * birth, and the tables themselves would be corrupt if they weren't. */
  private[graft] def register(
      spark: SparkSession,
      storeDir: String,
      family: String,
      keyCols: Seq[String],
      param: Option[Int]): Unit = {
    require(Families.contains(family), s"unknown store family $family")
    if (!Fs.exists(spark, descriptorPath(storeDir))) {
      val keys = keyCols.map(k =>
        "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      val json = s"""{"version":1,"family":"$family",""" +
        s""""key_cols":[${keys.mkString(",")}],""" +
        s""""param":${param.map(_.toString).getOrElse("null")}}"""
      Fs.writeStringAtomic(spark, descriptorPath(storeDir), json)
    }
  }

  private def readDescriptor(
      spark: SparkSession, storeDir: String): Option[Descriptor] = {
    if (!Fs.exists(spark, descriptorPath(storeDir))) return None
    val raw = Fs.readString(spark, descriptorPath(storeDir))
    scala.util.Try {
      implicit val fmt: org.json4s.Formats = org.json4s.DefaultFormats
      val j = org.json4s.jackson.JsonMethods.parse(raw)
      Descriptor(
        (j \ "family").extract[String],
        (j \ "key_cols").extract[Seq[String]],
        (j \ "param").extractOpt[Int])
    }.toOption
  }

  /** Legacy detection for stores written before the descriptor existed:
    * the table layout identifies the family (counters+meta = MG,
    * sketches = HLL, rows = reservoir; an `items` table is the KLL
    * store when it carries `level`/`value`, the quality ledger when it
    * carries `rule`/`n_violations`). Key columns are whatever the data
    * table holds beyond the family's own columns. The fold parameter is
    * NOT inferable (that is the point of the descriptor). */
  private def detectLegacy(
      spark: SparkSession, storeDir: String): Option[Descriptor] = {
    def tbl(name: String) = new SnapshotTable(spark, s"$storeDir/$name")
    if (tbl("counters").exists)
      tbl("counters").read().map { c =>
        Descriptor("heavy_hitters",
          c.columns.toSeq.diff(Seq("item", "cnt", "batch_id")), None)
      }
    else if (tbl("sketches").exists)
      tbl("sketches").read().map { s =>
        Descriptor("distinct",
          s.columns.toSeq.diff(Seq("sketch", "batch_id")), None)
      }
    else if (tbl("rows").exists)
      Some(Descriptor("reservoir", Nil, None))
    else if (tbl("items").exists)
      tbl("items").read().map { i =>
        val cols = i.columns.toSet
        if (cols.contains("level") && cols.contains("value"))
          Descriptor("quantiles",
            i.columns.toSeq.diff(
              Seq("level", "value", "batch_id", "n_rows")), None)
        else if (cols.contains("fp_hi_sum"))
          Descriptor("fingerprint", Nil, None)
        else Descriptor("quality_ledger", Nil, None)
      }
    else None
  }

  private def descriptorFor(
      spark: SparkSession, storeDir: String): Option[Descriptor] =
    readDescriptor(spark, storeDir).orElse(detectLegacy(spark, storeDir))

  /** Store directories under `dir` (including `dir` itself), walking at
    * most `maxDepth` directory levels — filesystem metadata only. A
    * directory "is a store" when it carries a descriptor or a legacy
    * table layout. Children of a store are never descended into (its
    * tables are not stores). */
  private def discover(
      spark: SparkSession, dir: String, maxDepth: Int = 3): Seq[String] = {
    def isStore(d: String): Boolean =
      Fs.exists(spark, descriptorPath(d)) ||
        DataTable.values.toSeq.distinct
          .exists(t => new SnapshotTable(spark, s"$d/$t").exists)
    def walk(d: String, depth: Int): Seq[String] =
      if (isStore(d)) Seq(d)
      else if (depth >= maxDepth) Nil
      // listDirs yields child NAMES — re-anchor them under the parent
      else Fs.listDirs(spark, d).map(n => s"$d/$n")
        .flatMap(walk(_, depth + 1))
    if (!Fs.exists(spark, dir)) Nil else walk(dir, 0)
  }

  /** Inventory every monitor store under `dir` (or `dir` itself when it
    * is one): `store_dir | family | key_cols | param | n_epochs |
    * has_folded | n_rows | fold_watermark | registered`. `param` is the
    * family's fold parameter from the descriptor (MG capacity, KLL /
    * reservoir k, HLL lgK; null for the ledger and for legacy stores),
    * `registered` whether a descriptor exists (legacy stores read
    * false), `n_epochs` counts REAL epochs (the consolidated sentinel
    * segment reports through `has_folded`), `fold_watermark` −1 when
    * never folded. One row per store; generalizes
    * [[Profile.sketchStoreStats]] across the whole family. */
  def describe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val rows = discover(spark, dir).sorted.flatMap { sd =>
      descriptorFor(spark, sd).map { d =>
        val data = new SnapshotTable(spark, s"$sd/${DataTable(d.family)}")
          .read()
        val (nEpochs, hasFolded, nRows) = data match {
          case None => (0L, false, 0L)
          case Some(df) =>
            // the counts are aggregates, so compute them IN-PLAN — a
            // legacy never-folded store that streamed for months holds
            // one epoch per micro-batch, and describe exists precisely
            // to inventory those stragglers without collecting them
            val s = df.agg(
              countDistinct(when(
                col("batch_id") =!= lit(Profile.FoldedEpochId),
                col("batch_id"))).as("__ne"),
              coalesce(sum(when(
                col("batch_id") === lit(Profile.FoldedEpochId), 1L)
                .otherwise(0L)), lit(0L)).as("__nf"),
              count(lit(1)).as("__nr")).head()
            (s.getLong(0), s.getLong(1) > 0L, s.getLong(2))
        }
        (sd, d.family, d.keyCols, d.param, nEpochs, hasFolded, nRows,
          Profile.foldWatermark(spark, sd),
          Fs.exists(spark, descriptorPath(sd)))
      }
    }
    rows.toDF("store_dir", "family", "key_cols", "param", "n_epochs",
      "has_folded", "n_rows", "fold_watermark", "registered")
  }

  /** Bound every monitor store under `dir`: run each discovered store's
    * family fold with `maxEpochs` (consolidating all but the newest
    * `max(1, maxEpochs/2)` real epochs — the amortized discipline the
    * writers use, here forced unconditionally so an operator can cap a
    * store whose stream stopped mid-window). Returns one row per store:
    * `store_dir | family | action | n_epochs_before | n_epochs_after |
    * n_rows_before | n_rows_after`; `action` is `folded`, `noop` (under
    * the cap already), or `skipped_no_descriptor` (a legacy MG/KLL/
    * reservoir store whose fold parameter is unknown — folding with a
    * guessed capacity/k would silently widen the envelope; re-register
    * by appending one batch through the current writer, or fold
    * manually with the known parameter). Views are unchanged across
    * every fold (each family's consolidation is associative — see the
    * per-family fold docs). */
  def compact(
      spark: SparkSession, dir: String, maxEpochs: Int = 64): DataFrame = {
    import spark.implicits._
    require(maxEpochs > 0, "maxEpochs must be positive to compact")
    val rows = discover(spark, dir).sorted.flatMap { sd =>
      descriptorFor(spark, sd).map { d =>
        val table = new SnapshotTable(spark, s"$sd/${DataTable(d.family)}")
        def stats(): (Long, Long) = table.read() match {
          case None => (0L, 0L)
          case Some(df) =>
            // in-plan like describe's: never collect the epoch-id set
            val s = df.agg(
              countDistinct(when(
                col("batch_id") =!= lit(Profile.FoldedEpochId),
                col("batch_id"))).as("__ne"),
              count(lit(1)).as("__nr")).head()
            (s.getLong(0), s.getLong(1))
        }
        val (epochsBefore, rowsBefore) = stats()
        val action =
          if (epochsBefore <= maxEpochs) "noop"
          else (d.family, d.param) match {
            case ("heavy_hitters", Some(cap)) =>
              Profile.foldHeavyHitterStore(spark, sd, cap, maxEpochs,
                d.keyCols)
              "folded"
            case ("quantiles", Some(k)) =>
              Profile.foldSketchStore(spark, sd, d.keyCols, k, maxEpochs)
              "folded"
            case ("reservoir", Some(k)) =>
              Profile.foldReservoirStore(spark, sd, k, maxEpochs)
              "folded"
            case ("distinct", _) =>
              Profile.foldDistinctStore(spark, sd, maxEpochs, d.keyCols)
              "folded"
            case ("quality_ledger", _) =>
              Validate.foldCheckStore(spark, sd, maxEpochs)
              "folded"
            case ("fingerprint", _) =>
              Diff.foldFingerprintStore(spark, sd, maxEpochs)
              "folded"
            case _ => "skipped_no_descriptor"
          }
        val (epochsAfter, rowsAfter) =
          if (action == "folded") stats() else (epochsBefore, rowsBefore)
        (sd, d.family, action, epochsBefore, epochsAfter, rowsBefore,
          rowsAfter)
      }
    }
    rows.toDF("store_dir", "family", "action", "n_epochs_before",
      "n_epochs_after", "n_rows_before", "n_rows_after")
  }
}
