package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.harness.Lake

/** Run an alphabetical slice of the SparkEntry sweep (Bench order, Bench
  * session shape) and then a target query — the instrument for "query X is
  * fast isolated but slow mid-sweep" context bugs. Args:
  * fromName toName target (runs queries in [fromName, toName) sorted, then
  * target with wall printed). */
object SweepSlice {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (from, to, target) = (args(0), args(1), args(2))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val lake = Lake.get(spark, sfDir)
    lake.prebuild()
    // failures must be unmistakable in sweep logs: a throwing target that
    // still prints a normal-looking wall time reads as a timing result
    // (r14 advice) — tag the line FAILED instead
    def run(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[slice] $name failed: ${e.getMessage}")
          false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    SparkEntry.queries.keys.toSeq.sorted
      .filter(n => n >= from && n < to)
      .foreach { n =>
        val (s, ok) = run(n)
        System.err.println(f"[slice] $n $s%.1fs${if (ok) "" else " FAILED"}%s")
        System.gc()
      }
    if (sys.env.contains("GRAFT_SLICE_CLEAR")) {
      spark.sharedState.cacheManager.clearCache()
      (1 to 3).foreach { _ => System.gc(); Thread.sleep(1000) }
      System.err.println("[slice] cleared caches + 3x gc")
    }
    val (s, ok) = run(target)
    println(f"[slice] TARGET $target $s%.1fs${if (ok) "" else " FAILED"}%s")
    spark.stop()
  }
}
