package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-style smoke: a bare session (no graft-specific confs, default
  * shuffle partitions) must be able to run SparkEntry.entry with rows>0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows=$n (want >0)")
    spark.stop()
  }
}
