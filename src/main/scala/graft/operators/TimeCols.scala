package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Numeric view of point-in-time columns for the time-join operators.
  *
  * The as-of bucketing and interval binning arithmetic (`ts div width`)
  * needs an integral timeline, but real lakes carry TIMESTAMP columns.
  * Rather than forcing callers to pre-cast, the operators normalize
  * internally: timestamps become epoch-MICROSECOND longs (the full
  * precision of Spark's timestamp types, so the mapping is lossless and
  * strictly monotonic — ordering and equality are preserved exactly).
  * Bin widths, bucket widths and tolerances for timestamp columns are
  * therefore expressed in microseconds.
  *
  * TIMESTAMP_NTZ is interpreted in the session time zone on its way to
  * epoch micros (every entry point in this library pins UTC). The absolute
  * epoch only shifts bin ALIGNMENT, never which rows match: matching uses
  * the same monotonic view on both sides.
  */
private[graft] object TimeCols {

  def isTimeType(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  /** Monotonic numeric view of column `c` with declared type `dt`:
    * epoch-micros for timestamps, pass-through for numerics. */
  def numeric(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _: NumericType => c
    case other => throw new IllegalArgumentException(
      s"time column must be numeric or timestamp, got $other")
  }

  /** Inverse of [[numeric]] for timestamp types: epoch-micros back to the
    * original timestamp type (exact — both types carry micros). */
  def fromMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampType => timestamp_micros(c)
    case TimestampNTZType => timestamp_micros(c).cast(TimestampNTZType)
    case _ => c
  }

  def numericFor(df: DataFrame, colName: String): Column =
    numeric(col(colName), df.schema(colName).dataType)

  /** Every listed (frame, column) must sit on ONE timeline: all timestamps
    * or all numerics. Mixing would silently compare epoch-micros against
    * raw numbers — fail loudly instead (the union-based [[AsOfJoin.asOf]]
    * gets this check for free from Spark's type resolution; the
    * normalize-each-side operators need it explicit). */
  def requireSameTimeline(cols: (DataFrame, String)*): Unit = {
    val kinds = cols.map { case (df, c) =>
      (c, isTimeType(df.schema(c).dataType)) }
    if (kinds.map(_._2).distinct.size > 1)
      throw new IllegalArgumentException(
        "time columns must be all timestamps or all numerics, got: " +
          kinds.map { case (c, t) =>
            s"$c=${if (t) "timestamp" else "numeric"}" }.mkString(", "))
  }
}
