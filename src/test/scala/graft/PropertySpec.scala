package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.functions.{Blooms, VectorOps}
import graft.operators.Dedup

/** Seeded randomized checks for the custom codegen'd expressions: they must
  * agree exactly with the composable built-ins they replace, across many
  * random inputs (one Spark job per batch, 200 cases per property). */
class PropertySpec extends GraftSuite {
  private val rnd = new Random(42)
  private val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "longer", "token", "zz")

  private def randomSet(): Seq[String] =
    Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).distinct

  test("sortedIntersectCount == size(array_intersect) over 200 random set pairs") {
    import spark.implicits._
    val cases = Seq.fill(200)((randomSet(), randomSet()))
    val df = cases.toDF("a", "b")
      .select(array_sort(col("a")).as("sa"), array_sort(col("b")).as("sb"))
      .select(
        VectorOps.sortedIntersectCount(col("sa"), col("sb")).as("merge"),
        size(array_intersect(col("sa"), col("sb"))).as("builtin"))
    assert(df.where(col("merge") =!= col("builtin")).count() == 0)
  }

  test("jaccardSorted == built-in jaccard over 200 random nonempty set pairs") {
    import spark.implicits._
    val cases = Seq.fill(200)((randomSet() :+ "x", randomSet() :+ "y"))
    val df = cases.toDF("a", "b")
      .select(array_sort(col("a")).as("sa"), array_sort(col("b")).as("sb"))
      .select(
        Dedup.jaccardSorted(col("sa"), col("sb")).as("merge"),
        Dedup.jaccard(col("sa"), col("sb")).as("builtin"))
    assert(df.where(col("merge") =!= col("builtin")).count() == 0)
  }

  test("bloom filter has no false negatives over 500 random values") {
    import spark.implicits._
    val values = Seq.fill(500)(rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString)
    val bytesRow = values.toDF("v")
      .agg(Blooms.bloomAgg(col("v"), 10000, 0.01).as("b")).first()
    val bf = Blooms.deserialize(bytesRow.getAs[Array[Byte]](0))
    values.foreach(x => assert(bf.mightContainString(x), s"false negative: $x"))
  }

  test("FloatVectorDot == left-fold double dot over 200 random vectors") {
    import spark.implicits._
    val cases = Seq.fill(200)((
      Seq.fill(8)(rnd.nextFloat() * 20 - 10),
      Seq.fill(8)(rnd.nextFloat() * 20 - 10)))
    val got = cases.toDF("a", "b")
      .select(VectorOps.dotF(col("a"), col("b")).as("d")).collect().map(_.getDouble(0))
    val want = cases.map { case (a, b) =>
      a.zip(b).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
    }
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }
}
