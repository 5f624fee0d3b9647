package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join: attach to each left row the single right row
  * with equal keys and the LATEST right timestamp <= the left timestamp
  * (`backward`; `forward` = earliest right ts >= left ts). Left-outer
  * semantics — unmatched left rows keep null right columns — matching
  * DuckDB/pandas `ASOF LEFT JOIN`.
  *
  * Neither the reference nor stock Spark has this operator (SURVEY §2.3
  * "not implemented"); training-data pipelines need it constantly
  * (feature-state at example time, point-in-time-correct labels).
  *
  * Spark-first shape: NO join at all — union both sides tagged by origin,
  * one window per key ordered by (ts, side), and a running
  * `last(right_payload, ignoreNulls)` carries the most recent right row
  * forward into each left row. One shuffle on the key, no range-condition
  * BroadcastNestedLoop blowup, no per-key explode. Skewed keys cost one
  * task's sort of that key's rows (same bound as any windowed op); at
  * 100 TB, pre-bucketing both sides by key makes the shuffle a local sort.
  */
object AsOfJoin {

  /** @param valueCols    right-side columns to attach (must not collide with
    *                     left column names)
    * @param rightTsAlias if non-empty, also attach the matched right row's
    *                     timestamp under this name
    * @param direction    "backward" (right.ts <= left.ts, latest wins) or
    *                     "forward" (right.ts >= left.ts, earliest wins)
    * @param tolerance    max |left.ts - right.ts| for a match — in the ts
    *                     column's own units for numeric columns, in
    *                     MICROSECONDS for timestamp columns
    *
    * Right rows with a null timestamp never match; left rows with a null
    * timestamp come out unmatched (SQL comparison-with-null semantics,
    * same as DuckDB ASOF). Ties on (key, ts) inside the right side are
    * broken by the greatest payload struct — deterministic on any
    * partitioning.
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      rightTsAlias: String = "",
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(", ")}")

    // payload struct the window carries: matched right ts first (tolerance +
    // alias need it), then the requested value columns
    import org.apache.spark.sql.types.{StructField, StructType}
    val rPayload = struct(
      (col(rightTsCol).as("__rts") +: valueCols.map(col)): _*)
    val rPayloadType = StructType(
      StructField("__rts", right.schema(rightTsCol).dataType) +:
        valueCols.map(c => right.schema(c)))
    val lPayloadType = StructType(left.schema.fields)
    // SQL join semantics: a NULL key matches nothing. The window would
    // happily group null keys into a partition and match them to each
    // other — drop null-key right rows instead (left null-key rows then
    // land in a partition with no right rows and come out unmatched).
    val rTagged = right
      .where(col(rightTsCol).isNotNull &&
        keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTsCol).as("__ts"),
          lit(if (direction == "backward") 0 else 1).as("__side"),
          rPayload.as("__r"),
          lit(null).cast(lPayloadType).as("__l")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__ts"),
        lit(if (direction == "backward") 1 else 0).as("__side"),
        lit(null).cast(rPayloadType).as("__r"),
        struct(left.columns.map(col): _*).as("__l")): _*)

    // Ordering invariants: at equal ts the right row must fall on the
    // matching side of the frame (<= and >= are inclusive), hence __side
    // 0/1 flips with direction. Null left ts sorts first under ascending
    // nulls-first — before every right row — so `last` over the preceding
    // frame is null there (backward); forward guards explicitly.
    // Tie-break on equal (key, ts): the GREATEST payload struct wins in
    // BOTH directions (forward orders __r descending so `first` lands on
    // it) — one rule, and it matches what negation-based reductions and
    // the bucketed variant's struct-max produce.
    val w = Window.partitionBy(keyCols.map(col): _*)
    val matched = direction match {
      case "backward" =>
        last(col("__r"), ignoreNulls = true)
          .over(w.orderBy(col("__ts"), col("__side"), col("__r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
      case "forward" =>
        when(col("__ts").isNotNull,
          first(col("__r"), ignoreNulls = true)
            .over(w.orderBy(col("__ts"), col("__side"), col("__r").desc)
              .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    }

    val isLeft = col("__side") === lit(if (direction == "backward") 1 else 0)
    val withMatch = lTagged.unionByName(rTagged)
      .withColumn("__m", matched)
      .where(isLeft)
    val bounded = tolerance match {
      case Some(tol) =>
        // timestamps subtract to an interval, not a number — compare on the
        // epoch-micros view instead (tolerance is in µs for time columns)
        val lN = TimeCols.numeric(col("__ts"), left.schema(leftTsCol).dataType)
        val rN = TimeCols.numeric(col("__m.__rts"), right.schema(rightTsCol).dataType)
        val gap = if (direction == "backward") lN - rN else rN - lN
        withMatch.withColumn("__m", when(gap <= lit(tol), col("__m")))
      case None => withMatch
    }
    val outCols =
      left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(c => col(s"__m.$c").as(c)) ++
        (if (rightTsAlias.nonEmpty) Seq(col("__m.__rts").as(rightTsAlias)) else Nil)
    bounded.select(outCols: _*)
  }

  /** Nearest-neighbor as-of: attach the right row whose timestamp is
    * CLOSEST to each left row's (either side); exact |Δt| ties prefer the
    * backward match (the point-in-time-safe choice). Tolerance bounds
    * |Δt| in the usual units (µs for timestamp columns). The pandas
    * `merge_asof(direction="nearest")` shape, absent from SQL engines.
    *
    * Execution: the SAME single union as [[asOf]], with BOTH directional
    * window aggregates evaluated over it — one key shuffle, two in-
    * partition sorts (the two orderings differ only in tag polarity), no
    * second pass over either input and no left-row id stitching. */
  def asOfNearest(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      rightTsAlias: String = "",
      tolerance: Option[Long] = None): DataFrame = {
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(", ")}")
    import org.apache.spark.sql.types.{StructField, StructType}
    val rPayload = struct(
      (col(rightTsCol).as("__rts") +: valueCols.map(col)): _*)
    val rPayloadType = StructType(
      StructField("__rts", right.schema(rightTsCol).dataType) +:
        valueCols.map(c => right.schema(c)))
    val lPayloadType = StructType(left.schema.fields)
    // one tagging serves both directions: right rows 0, left rows 1; the
    // backward ordering (ts, side) puts tied right rows INSIDE the
    // preceding-inclusive frame, the forward ordering (ts, -side) puts
    // them inside the following-inclusive frame
    val rTagged = right
      .where(col(rightTsCol).isNotNull &&
        keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          col(rightTsCol).as("__ts"), lit(0).as("__side"),
          rPayload.as("__r"),
          lit(null).cast(lPayloadType).as("__l")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__ts"), lit(1).as("__side"),
        lit(null).cast(rPayloadType).as("__r"),
        struct(left.columns.map(col): _*).as("__l")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
    val mB = last(col("__r"), ignoreNulls = true)
      .over(w.orderBy(col("__ts"), col("__side"), col("__r"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val mF = when(col("__ts").isNotNull,
      first(col("__r"), ignoreNulls = true)
        .over(w.orderBy(col("__ts"), negate(col("__side")), col("__r").desc)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    val withBoth = lTagged.unionByName(rTagged)
      .withColumn("__mb", mB).withColumn("__mf", mF)
      .where(col("__side") === 1)
    val lN = TimeCols.numeric(col("__ts"), left.schema(leftTsCol).dataType)
    def rN(m: String) =
      TimeCols.numeric(col(s"$m.__rts"), right.schema(rightTsCol).dataType)
    val bounded = tolerance match {
      case Some(tol) => withBoth
        .withColumn("__mb", when(lN - rN("__mb") <= lit(tol), col("__mb")))
        .withColumn("__mf", when(rN("__mf") - lN <= lit(tol), col("__mf")))
      case None => withBoth
    }
    val chosen = when(col("__mb").isNull, col("__mf"))
      .when(col("__mf").isNull, col("__mb"))
      .otherwise(when(rN("__mf") - lN < lN - rN("__mb"), col("__mf"))
        .otherwise(col("__mb")))
    val outCols =
      left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(c => col(s"__m.$c").as(c)) ++
        (if (rightTsAlias.nonEmpty) Seq(col("__m.__rts").as(rightTsAlias)) else Nil)
    bounded.withColumn("__m", chosen).select(outCols: _*)
  }

  /** Skew-resistant bucketed as-of: same results as [[asOf]], different
    * parallelism bound. Timestamp ts columns are normalized to epoch-micros
    * internally ([[TimeCols]]) — `bucketWidth` (and `tolerance`) are in
    * MICROSECONDS for them, in the column's own units for numerics. [[asOf]]
    * sorts each key's entire history on one window task — fine for normal
    * keys, a serial bottleneck for a pathological hot key at 100 TB. Here
    * the heavy window partitions by (key, ts div bucketWidth), so a hot key
    * costs O(rows per bucket) per task; cross-bucket state is ONE carry-in
    * row per (key, bucket) — the same two-level scan as the distributed
    * prefix sum in `Sampling.packByTokenBudget`.
    *
    * Pick bucketWidth so one bucket holds a bounded slice of the hottest
    * key's traffic (a day of events, say). Extra cost vs [[asOf]]: a tiny
    * per-bucket aggregate + a join back. */
  def asOfBucketed(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      valueCols: Seq[String],
      bucketWidth: Long,
      rightTsAlias: String = "",
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    TimeCols.requireSameTimeline((left, leftTsCol), (right, rightTsCol))
    if (direction == "forward") {
      // forward == backward on the negated NUMERIC timeline (timestamps go
      // through their epoch-micros view); temp columns keep the user's ts
      // columns (carried in the output payload) untouched
      val rTsDt = right.schema(rightTsCol).dataType
      val l2 = left.withColumn("__graft_nts", -TimeCols.numericFor(left, leftTsCol))
      val r2 = right.withColumn("__graft_nts", -TimeCols.numericFor(right, rightTsCol))
      val res = asOfBucketed(l2, r2, keyCols, "__graft_nts", "__graft_nts",
        valueCols, bucketWidth, rightTsAlias, tolerance, "backward")
        .drop("__graft_nts")
      return if (rightTsAlias.nonEmpty)
        // un-negate, and restore the original timestamp type if there was one
        res.withColumn(rightTsAlias,
          TimeCols.fromMicros(-col(rightTsAlias), rTsDt))
      else res
    }
    val collisions = valueCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right value columns collide with left columns: ${collisions.mkString(", ")}")

    import org.apache.spark.sql.types.{StructField, StructType}
    val rPayload = struct(
      (col(rightTsCol).as("__rts") +: valueCols.map(col)): _*)
    val rPayloadType = StructType(
      StructField("__rts", right.schema(rightTsCol).dataType) +:
        valueCols.map(c => right.schema(c)))
    val lPayloadType = StructType(left.schema.fields)
    // bucketing/ordering run on the numeric (epoch-micros for timestamps)
    // view of ts; the payload __rts keeps the ORIGINAL right ts value, so
    // rightTsAlias comes out in the caller's own type
    val rTagged = right
      .where(col(rightTsCol).isNotNull &&
        keyCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keyCols.map(col) ++ Seq(
          TimeCols.numericFor(right, rightTsCol).as("__ts"),
          lit(0).as("__side"),
          rPayload.as("__r"),
          lit(null).cast(lPayloadType).as("__l")): _*)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        TimeCols.numericFor(left, leftTsCol).as("__ts"),
        lit(1).as("__side"),
        lit(null).cast(rPayloadType).as("__r"),
        struct(left.columns.map(col): _*).as("__l")): _*)

    val unioned = lTagged.unionByName(rTagged)
      .withColumn("__b", expr(s"__ts div ${bucketWidth}L"))
    val order = Seq(col("__ts"), col("__side"), col("__r"))
    val gridCols = keyCols :+ "__b"

    // level 1: running last-right WITHIN each (key, bucket) — the per-task
    // sort is bounded by the bucket, not the key's full history
    val wLocal = Window.partitionBy(gridCols.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = unioned.withColumn("__mloc",
      last(col("__r"), ignoreNulls = true).over(wLocal))

    // level 2: latest right payload per OCCUPIED (key, bucket) — (ts,
    // payload) struct max reproduces asOf's greatest-payload tie-break —
    // spread onto the full (key, bucket) grid so buckets holding only left
    // rows still receive a carry-in from earlier occupied buckets
    val bucketLast = unioned
      .where(col("__r").isNotNull)
      .groupBy(gridCols.map(col): _*)
      .agg(max(struct(col("__ts"), col("__r"))).as("__blast"))
    val grid = unioned.select(gridCols.map(col): _*).distinct()
    val wCarry = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = grid.join(bucketLast, gridCols, "left")
      .withColumn("__carry", last(col("__blast"), ignoreNulls = true).over(wCarry))
      .select(gridCols.map(col) :+ col("__carry.__r").as("__cr"): _*)

    val matched = local
      .join(carry, gridCols, "left")
      .withColumn("__m", coalesce(col("__mloc"), col("__cr")))
      .where(col("__side") === 1)
    val bounded = tolerance match {
      case Some(tol) =>
        val rN = TimeCols.numeric(col("__m.__rts"), right.schema(rightTsCol).dataType)
        matched.withColumn("__m",
          when(col("__ts") - rN <= lit(tol), col("__m")))
      case None => matched
    }
    val outCols =
      left.columns.toSeq.map(c => col(s"__l.$c").as(c)) ++
        valueCols.map(c => col(s"__m.$c").as(c)) ++
        (if (rightTsAlias.nonEmpty) Seq(col("__m.__rts").as(rightTsAlias)) else Nil)
    bounded.select(outCols: _*)
  }
}
