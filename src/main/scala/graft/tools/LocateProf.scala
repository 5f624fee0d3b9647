package graft.tools
import org.apache.spark.sql.SparkSession
import graft.harness.Lake
object LocateProf {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lake = Lake.get(spark, sfDir)
    lake.prebuild()
    val idx = lake.ordersIdx
    def t(l: String)(b: => Any): Unit = {
      (1 to 4).foreach { r =>
        val t0 = System.nanoTime(); val x = b
        println(f"[locate] $l rep$r ${(System.nanoTime()-t0)/1e9}%.3fs -> $x")
      }
    }
    t("locate_custkey")(idx.locateFiles(Map("o_custkey" -> Seq(5L, 77L))).size)
    t("locate_range")(idx.locateFiles(Map("o_orderkey" -> Seq(100L))).size)
    t("query_count")(idx.query(Map("o_custkey" -> Seq(5L, 77L))).count())
    spark.stop()
  }
}
