package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build + probe over Spark's own `org.apache.spark.util.sketch`
  * (ships in spark-sketch, public API).
  *
  * Semantics parity with the reference: values are hashed by their STRING
  * representation (reference: BloomFilterOperations.scala:160,213-214), so
  * callers cast the input column to string before aggregating and stringify
  * probe values the same way.
  *
  * Unlike the reference — which materializes `collect_set` arrays and then
  * runs a driver-friendly UDF (BloomFilterOperations.scala:104-117) — the
  * build here is a streaming [[Aggregator]]: no per-file distinct array ever
  * materializes, which is what survives a file with 10^8 distinct values at
  * 100 TB. The cost is fixed sizing (`expectedItems` per batch instead of
  * per file); Spark's own BloomFilterAggregate makes the same tradeoff.
  */
object Blooms {

  final class BloomAggregator(expectedItems: Long, fpr: Double)
      extends Aggregator[String, BloomFilter, Array[Byte]] {
    override def zero: BloomFilter = BloomFilter.create(expectedItems, fpr)
    override def reduce(b: BloomFilter, v: String): BloomFilter = {
      if (v != null) b.putString(v)
      b
    }
    override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
      a.mergeInPlace(b)
    override def finish(b: BloomFilter): Array[Byte] = serialize(b)
    override def bufferEncoder: Encoder[BloomFilter] = Encoders.kryo[BloomFilter]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  def serialize(b: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    b.writeTo(out)
    out.toByteArray
  }

  def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Aggregation column building a serialized bloom over a string column. */
  def bloomAgg(col: Column, expectedItems: Long, fpr: Double): Column =
    org.apache.spark.sql.functions.udaf(new BloomAggregator(expectedItems, fpr))
      .apply(col)

  /** Build a bloom from an already-materialized value array, sized exactly to
    * the array (used for auto-bloom over large-index arrays, where the array
    * exists anyway — reference: IndexBuildOperations.scala:1131-1189). */
  def bloomFromArray(fpr: Double): Column => Column = {
    val f = udf { (values: Seq[Any]) =>
      if (values == null) null
      else {
        val bf = BloomFilter.create(math.max(values.size.toLong, 1L), fpr)
        values.foreach(v => if (v != null) bf.putString(v.toString))
        serialize(bf)
      }
    }
    c => f(c)
  }

  /** Executor-side probe: does this file's bloom possibly contain ANY of the
    * probe values? Null bloom ⇒ candidate (backward-compat semantics,
    * reference: IndexQueryOperations.scala:387-468). Runs distributed over
    * the index table — never collects filter bytes to the driver (the
    * reference's acknowledged OOM risk, BloomFilterOperations.scala:240-243).
    */
  def mightContainAny(values: Seq[String]): Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) true
      else {
        val bf = deserialize(bytes)
        values.exists(v => v != null && bf.mightContainString(v))
      }
    }
    c => f(c)
  }

  /** ALL-match probe: does this file's bloom possibly contain EVERY probe
    * value? The phrase-search semantics — a file holding the phrase holds
    * every one of its windows, so requiring all values prunes strictly
    * tighter than any-match while staying sound (false positives only).
    * Null bloom ⇒ candidate, like [[mightContainAny]]. */
  def mightContainAll(values: Seq[String]): Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) true
      else {
        val bf = deserialize(bytes)
        values.forall(v => v == null || bf.mightContainString(v))
      }
    }
    c => f(c)
  }

  /** Same any-match probe, but over a BROADCAST value array: for probe sets
    * past the literal-`isin` comfort zone (10^4–10^6 values) the values ship
    * to executors once instead of being inlined into the plan, and each
    * file row pays one O(values × k-hashes) in-memory loop. Deserialization
    * happens once per file row either way. */
  def mightContainAnyBroadcast(
      values: org.apache.spark.broadcast.Broadcast[Array[String]]): Column => Column = {
    val f = udf { (bytes: Array[Byte]) =>
      if (bytes == null) true
      else {
        val bf = deserialize(bytes)
        val vs = values.value
        var i = 0
        var hit = false
        while (!hit && i < vs.length) {
          hit = bf.mightContainString(vs(i))
          i += 1
        }
        hit
      }
    }
    c => f(c)
  }
}
