package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch profiler: print the finalized physical plan + exchange count for
  * a named SparkEntry query (args: queryName [sfDir]). */
object PlanProf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_strip_lines")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val t0 = System.nanoTime()
    df.collect()
    println(f"[prof] $name collect ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    println(s"[prof] exchange-lines=$exchanges")
    spark.stop()
  }
}
