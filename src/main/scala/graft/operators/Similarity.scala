package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - Brute-force cosine (threshold and top-k) as the exactness baseline:
  *   O(n*q) dot products via codegen'd `zip_with`+`aggregate` — no UDFs.
  *   Query side is broadcast; corpus side streams, so it scales with
  *   executor count for small query sets.
  * - LSH-bucketed variant (random hyperplane signatures) as the 100 TB
  *   path: candidates meet in sign-pattern buckets, shuffle-joined on the
  *   bucket key; exact cosine re-ranks candidates only.
  *
  * All arithmetic in double, folded left-to-right in array-position order —
  * bit-identical to a position-ordered loop, which keeps results comparable
  * against engines that do the same.
  */
object Similarity {

  /** dot(a,b) over float arrays, computed in double, position order. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** All pairs (a_id < b_id) with cosine >= threshold — brute force
    * baseline. Keep for small/medium corpora and as the oracle for the
    * LSH variant. */
  def cosinePairs(
      df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("a_id"), col(vecCol).as("__va"))
    val b = df.select(col(idCol).as("b_id"), col(vecCol).as("__vb"))
    a.join(b, col("a_id") < col("b_id"))
      .where(cosine(col("__va"), col("__vb")) >= threshold)
      .select("a_id", "b_id")
  }

  /** Top-k neighbors for each query row (small query set, broadcast).
    * Deterministic: ties broken by neighbor id ascending. */
  def topK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("__vq")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__vc"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("__cos", cosine(col("__vq"), col("__vc")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"))
  }

  /** Deterministic Rademacher (+1/-1) hyperplane component for (plane j,
    * dim d) — same splitmix-style mixing as Dedup, no RNG state. */
  private def planeSign(j: Int, d: Int): Double = {
    var z = (j.toLong << 32 | d.toLong) + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    if ((z ^ (z >>> 31)) % 2 == 0) 1.0 else -1.0
  }

  /** Random-hyperplane LSH signature: `nPlanes` sign bits packed into a
    * long. Vectors with small angle agree on most bits. */
  def lshSignature(vecCol: Column, dim: Int, nPlanes: Int): Column = {
    require(nPlanes <= 63, "nPlanes must fit in a long")
    val bits = (0 until nPlanes).map { j =>
      val proj = (0 until dim).map { d =>
        element_at(vecCol, d + 1).cast("double") * lit(planeSign(j, d))
      }.reduce(_ + _)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** ANN via LSH: bucket on band slices of the hyperplane signature, join
    * within buckets, re-rank candidates by exact cosine. Approximate —
    * recall depends on bands/planes; candidates only, never all-pairs. */
  def lshCosinePairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      threshold: Double,
      nPlanes: Int = 16,
      bandBits: Int = 4): DataFrame = {
    val sig = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      lshSignature(col(vecCol), dim, nPlanes).as("__sig"))
    val bands = nPlanes / bandBits
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("__sig"), b * bandBits)
          .bitwiseAND(lit((1L << bandBits) - 1)).as("bh"))
    }
    val buckets = sig
      .select(col("__id"), col("__v"), explode(array(bandCols: _*)).as("__b"))
      .select(col("__id"), col("__v"), col("__b.band").as("band"), col("__b.bh").as("bh"))
    val a = buckets.select(col("band"), col("bh"), col("__id").as("a_id"), col("__v").as("__va"))
    val b = buckets.select(col("band"), col("bh"), col("__id").as("b_id"), col("__v").as("__vb"))
    a.join(b, Seq("band", "bh"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("__va"), col("__vb")).distinct()
      .where(cosine(col("__va"), col("__vb")) >= threshold)
      .select("a_id", "b_id")
  }
}
