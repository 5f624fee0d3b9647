package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry
import graft.harness.Lake

/** Repeated-invocation diagnostic for a single SparkEntry query: times N
  * consecutive invocations in one JVM and prints per-call wall plus the
  * live persisted-RDD count — the instrument for "reps grow monotonically
  * in one process" leaks (r14: the q_hits heavy-tail triage showed reps
  * 15.5 → 19 → 19.6 → 28 → 538 s; this tool isolates whether the growth
  * is cache accumulation, and whether releasing the returned frame
  * flattens it). `args` = queryName [reps=8] [unpersistResult=false]. */
object LoopQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q_hits")
    val reps = if (args.length > 1) args(1).toInt else 8
    val unpersistResult = args.length > 2 && args(2).toBoolean
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Lake.get(spark, sfDir).prebuild()
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count()
      val dt = (System.nanoTime() - t0) / 1e9
      if (unpersistResult) df.unpersist(blocking = false)
      val nPersisted = spark.sparkContext.getPersistentRDDs.size
      val mem = (Runtime.getRuntime.totalMemory -
        Runtime.getRuntime.freeMemory) / (1024 * 1024)
      println(f"[loop] $name rep=$i sec=$dt%.2f persistedRDDs=$nPersisted heapUsedMB=$mem")
      System.gc()
    }
    spark.stop()
  }
}
