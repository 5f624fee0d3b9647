package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Replays Verify's exact query sequence with timing, optionally skipping
  * a prefix — to find which earlier query slows later ones down. */
object ProfileVerify {
  def main(args: Array[String]): Unit = {
    val skip = args.headOption.map(_.split(",").toSet).getOrElse(Set.empty)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val t0 = Option(starts.get(je.jobId)).getOrElse(0L)
        val sec = (System.nanoTime() - t0) / 1e9
        if (sec > 1.0) println(f"[pv-job] job=${je.jobId} $sec%.1fs")
      }
    })
    val sfDir = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1)
      .takeWhile(_._1 <= "q_computed_probe")
      .foreach { case (name, fn) =>
        if (skip.contains(name)) println(s"[pv] $name SKIPPED")
        else {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          println(f"[pv] $name ${(System.nanoTime() - t0) / 1e9}%.1fs")
        }
      }
    spark.stop()
  }
}
