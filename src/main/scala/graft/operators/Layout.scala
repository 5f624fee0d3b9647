package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

import graft.functions.ZValueExpr

/** Multi-dimensional data layout: Z-order (Morton) clustering of a table
  * so that per-file min/max metadata prunes range predicates on EVERY
  * clustered column at once — the write-side half of the repo's range
  * indexes (`addRangeIndex` records per-file bounds; `zorderWrite`
  * makes those bounds TIGHT on several columns simultaneously). A
  * lexicographic `orderBy(a, b)` clusters only `a`: every file spans the
  * full `b` domain, so a `b` predicate prunes nothing. Interleaving the
  * bits of fixed-point-bucketed `a` and `b` gives files that are small
  * rectangles in (a, b) space — the layout Delta Lake's `OPTIMIZE ZORDER
  * BY` and Iceberg's z-ordered rewrite produce, implemented here as a
  * plain deterministic DataFrame transform (bounded 1-row stats collect +
  * one codegen'd expression + one range repartition).
  *
  * Ref parity note: the reference has no layout operator; extends the
  * analytics surface per the training-data-ops mandate (SURVEY §2
  * addendum). At 100 TB this is the difference between a two-column box
  * predicate reading ~the box's volume and reading a full stripe of the
  * table.
  */
object Layout {

  /** Fixed-point bucket of a numeric column into `[0, 2^bits)` given the
    * column's global `[minV, maxV]`: `floor((x − min) / (max − min) ·
    * 2^bits)` clamped into range, all double arithmetic in an order any
    * engine replays bit-for-bit (IEEE 754, no reassociation). A constant
    * column buckets to 0. NULL stays NULL (ZValueExpr then yields NULL;
    * `zorderBy` sorts those rows to one end — they cluster together,
    * which is what a pruning layout wants). */
  def fixedPointBucket(c: Column, minV: Double, maxV: Double, bits: Int): Column = {
    require(bits >= 1 && bits <= 62, s"bits $bits out of range")
    val cap = (1L << bits) - 1
    if (!(maxV > minV)) when(c.isNull, lit(null)).otherwise(lit(0L))
    else {
      val scaled =
        floor((c.cast("double") - lit(minV)) / (lit(maxV) - lit(minV)) *
          lit((1L << bits).toDouble)).cast("long")
      // greatest/least IGNORE nulls in Spark (they'd turn NULL into 0);
      // the null-in-null-out contract needs the explicit guard
      when(c.isNull, lit(null).cast("long"))
        .otherwise(least(lit(cap), greatest(lit(0L), scaled)))
    }
  }

  /** Interleave pre-bucketed long columns (each in `[0, 2^bits)`) into
    * one z-value long. See [[graft.functions.ZValueExpr]]. */
  def zValue(cols: Seq[Column], bits: Int): Column =
    ZValueExpr.zValue(cols, bits)

  /** One bounded aggregate: exact global (min, max) per layout column,
    * returned as literals for the bucketing expressions. A 1-row collect
    * regardless of table size — the same bounded-stats shape
    * `IndexBuild`'s pre-flight uses. */
  private def minMax(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    cols.indices.map { i =>
      val mn = if (row.isNullAt(2 * i)) 0.0 else row.getDouble(2 * i)
      val mx = if (row.isNullAt(2 * i + 1)) 0.0 else row.getDouble(2 * i + 1)
      (mn, mx)
    }
  }

  /** The z-value of `cols` under their CURRENT global min/max, as an
    * extra column `out` — the inspectable/oracle-checkable core of
    * [[zorderBy]]. */
  def withZValue(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 16,
      out: String = "z_value"): DataFrame = {
    require(cols.nonEmpty, "withZValue needs at least one column")
    require(cols.size * bits <= 63, s"${cols.size} cols × $bits bits > 63")
    require(!cols.contains(out), s"output column $out collides with an input")
    cols.foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[NumericType] ||
        df.schema(c).dataType.typeName == "timestamp",
        s"layout column $c must be numeric or timestamp")
    }
    val bounds = minMax(df, cols)
    val bucketed = cols.zip(bounds).map { case (c, (mn, mx)) =>
      fixedPointBucket(col(c), mn, mx, bits)
    }
    df.withColumn(out, zValue(bucketed, bits))
  }

  /** The Hilbert curve position of two columns under their CURRENT global
    * min/max, as an extra column `out` — the inspectable/oracle-checkable
    * core of [[hilbertBy]]. Two dimensions only (the classic xy2d
    * transform; [[withZValue]] handles k > 2). */
  def withHilbertValue(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      out: String = "h_value"): DataFrame = {
    require(xCol != yCol, "layout columns must differ")
    require(!Seq(xCol, yCol).contains(out),
      s"output column $out collides with an input")
    Seq(xCol, yCol).foreach { c =>
      require(df.schema(c).dataType.isInstanceOf[NumericType] ||
        df.schema(c).dataType.typeName == "timestamp",
        s"layout column $c must be numeric or timestamp")
    }
    val Seq((mnx, mxx), (mny, mxy)) = minMax(df, Seq(xCol, yCol))
    df.withColumn(out, graft.functions.HilbertIndexExpr.hilbertIndex(
      fixedPointBucket(col(xCol), mnx, mxx, bits),
      fixedPointBucket(col(yCol), mny, mxy, bits), bits))
  }

  /** [[zorderBy]]'s Hilbert twin: re-layout into `numFiles` slices
    * contiguous on the Hilbert curve. Consecutive curve positions are
    * always grid-adjacent (the property the Z curve gives up at
    * power-of-two seams), so each file's per-column min/max box is
    * tighter and box predicates prune more files — measured against
    * z-order in the layout spec. */
  def hilbertBy(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = 16,
      numFiles: Int = 0): DataFrame = {
    val h = "__graft_h"
    val withH = withHilbertValue(df, xCol, yCol, bits, h)
    val parts =
      if (numFiles > 0) numFiles
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    withH.repartitionByRange(parts, col(h))
      .sortWithinPartitions(h)
      .drop(h)
  }

  /** Re-layout `df` into `numFiles` z-ordered slices: range-repartition on
    * the z-value (contiguous, balanced key ranges via sampled range
    * bounds — each output file is a compact z-curve segment, i.e. a small
    * hyper-rectangle in column space) and sort within each slice so
    * row-group-level stats are tight too. The helper column is dropped;
    * write the result with `.write.parquet(...)` and build range indexes
    * on the layout columns to serve box predicates with file skipping.
    * NULL z-values (a NULL in any layout column) range-sort first —
    * clustered, not scattered. */
  def zorderBy(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 16,
      numFiles: Int = 0): DataFrame = {
    val z = "__graft_z"
    val withZ = withZValue(df, cols, bits, z)
    val parts =
      if (numFiles > 0) numFiles
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    withZ.repartitionByRange(parts, col(z))
      .sortWithinPartitions(z)
      .drop(z)
  }

  /** Bucketed co-location: persist `df` as a Spark bucketed (and
    * optionally sorted) table so every LATER join or aggregation on the
    * bucket columns skips its shuffle — the scan's output partitioning
    * already satisfies the required hash distribution. This is THE
    * write-amortized answer for a fact table joined on the same key by
    * many downstream jobs at 100 TB: pay one clustered write, skip the
    * exchange forever after (both sides, when the dimension is bucketed
    * the same way with the same count; one side otherwise still saves
    * its own). `path = Some(...)` creates an EXTERNAL bucketed table at
    * that location (no warehouse dependency — the lake-friendly form);
    * `None` writes a managed table under the session warehouse.
    * Spark's bucket layout (hash(key) mod n file groups + the bucket
    * spec in the catalog) is what `spark.table(name)` reads back with
    * the shuffle-free guarantee; plain `spark.read.parquet(path)` sees
    * only files and loses it. [[shuffleCount]] is the certificate. */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int,
      sortCols: Seq[String] = Nil,
      path: Option[String] = None,
      format: String = "parquet",
      mode: String = "overwrite"): Unit = {
    require(bucketCols.nonEmpty, "at least one bucket column")
    require(numBuckets >= 1 && numBuckets <= 100000,
      s"numBuckets $numBuckets out of range")
    var w = df.write.format(format).mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.saveAsTable(tableName)
  }

  /** Number of shuffle exchanges in `df`'s physical plan (AQE inner
    * plans included — counted off the formatted plan text, where every
    * shuffle prints as an `Exchange` node; reused exchanges count
    * once). `BroadcastExchange` nodes do NOT count: a broadcast ships a
    * built hash relation to every executor but never repartitions rows,
    * so a bucketed join that Spark chooses to broadcast is still
    * shuffle-free. 0 is the bucketed-join certificate: the plan moves
    * no rows to satisfy its distribution requirements. */
  def shuffleCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(l => l.contains("Exchange ") && !l.contains("ReusedExchange")
        && !l.contains("BroadcastExchange"))
}
