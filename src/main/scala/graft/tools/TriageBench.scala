package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.harness.Lake

/** Repeated-run triage for bench deltas (r4 verdict item #3, r5 item #8):
  * interleaved timed runs of the named queries, isolating plan cost from
  * per-run container noise via medians. `args` = reps followed by query
  * names (defaults to the r4 temporal trio). */
object TriageBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.headOption.map(_.toInt).getOrElse(5)
    val names: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_temporal_latest", "q_temporal_join", "q_topk_group")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lake = Lake.get(spark, sfDir)
    lake.prebuild()
    // the Bench headline join (not a SparkEntry query) is triage-able too:
    // same probe construction as Bench.scala so medians compare 1:1
    import org.apache.spark.sql.functions.{col, max}
    lazy val probe = {
      val maxCust = lake.customers.agg(max("c_custkey")).first().getLong(0)
      lake.customers
        .where(col("c_custkey") <= maxCust / 8 && col("c_acctbal") > 5000)
        .select(col("c_custkey").as("o_custkey"))
    }
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      name match {
        case "x_join_indexed" =>
          lake.ordersIdx.join(probe, Seq("o_custkey")).count()
        case "x_join_fullscan" =>
          spark.read.parquet(lake.ordersFiles: _*)
            .join(probe, Seq("o_custkey")).count()
        case _ => SparkEntry.queries(name)(spark, sfDir).count()
      }
      (System.nanoTime() - t0) / 1e9
    }
    // warmup pass (JIT + index-table cache), then interleaved reps
    names.foreach(timeOne)
    val samples = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to reps).foreach { _ =>
      names.foreach { n => samples(n) = samples(n) :+ timeOne(n); System.gc() }
    }
    names.foreach { n =>
      val s = samples(n).sorted
      val med = s(s.size / 2)
      println(f"[triage] $n median=$med%.3f min=${s.head}%.3f max=${s.last}%.3f " +
        s"all=${s.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
