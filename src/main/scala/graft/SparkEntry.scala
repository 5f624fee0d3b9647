package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.harness.Lake

/** Driver contract — one `queries` entry (+ DuckDB oracle SQL) per operator.
  *
  * Every query builds/reuses the [[graft.harness.Lake]] (testdata split into
  * key-banded files + indexes built over them), runs the index-accelerated
  * path, and returns a result whose content is IDENTICAL to the plain query
  * over the original table — pruning must be invisible. Column names and
  * types are aligned with the oracle SQL (driver compares after sorting
  * columns by name). Floating-point outputs are avoided except where exact
  * (integral doubles, single int/int divisions).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_regular_join")(spark, "/root/testdata/sf0.001")

  private val CustKeys = Seq(1L, 7L, 13L, 42L, 99L, 121L)
  private val OrderKeys = Seq(3L, 10L, 57L, 123L, 400L, 888L)
  private val PartKeys = Seq(5L, 17L, 42L, 133L, 177L)
  private val SuppKeys = Seq(2L, 5L, 7L)
  private val UserIds = Seq(1L, 3L, 7L, 11L)
  private val Months = Seq(3L, 7L)
  private val Toks = Seq("spark", "merge")

  private def inList(vs: Seq[_]): String = vs.map {
    case s: String => s"'$s'"
    case v => v.toString
  }.mkString("(", ", ", ")")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- core index operators ---------------------------------------------
    "q_regular_join" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      val probe = lk.customers.where(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("o_custkey"))
      lk.ordersIdx.join(probe, Seq("o_custkey"))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),
    "q_regular_probe" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.ordersIdx.query(Map("o_custkey" -> CustKeys))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),
    "q_range_probe" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.ordersIdx.query(Map("o_orderkey" -> OrderKeys))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),
    "q_bloom_probe" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.lineitemIdx.query(Map("l_partkey" -> PartKeys))
        .select("l_orderkey", "l_linenumber", "l_partkey")
        .orderBy("l_orderkey", "l_linenumber")
    }),
    "q_computed_probe" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.ordersIdx.query(Map("o_month" -> Months))
        .select("o_orderkey", "o_month")
        .orderBy("o_orderkey")
    }),
    "q_exploded_probe" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.docsIdx.query(Map("tok" -> Toks))
        .select("doc_id", "tok")
        .orderBy("doc_id", "tok")
    }),
    "q_temporal_latest" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.eventsIdx.query(Map("user_id" -> UserIds))
        .select("event_id", "user_id", "event_type")
        .orderBy("user_id", "event_id")
    }),
    "q_multicol_and" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.ordersIdx.query(Map("o_custkey" -> CustKeys, "o_month" -> Months))
        .select("o_orderkey", "o_custkey", "o_month")
        .orderBy("o_orderkey")
    }),
    "q_csv_read" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.ordersCsvIdx.query(Map("o_custkey" -> CustKeys))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),
    "q_json_read" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.ordersJsonIdx.query(Map("o_custkey" -> CustKeys))
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")
    }),
    "q_select_join" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      val probe = lk.customers.where(col("c_acctbal") > 9500)
        .select(col("c_custkey").as("o_custkey"))
      lk.ordersIdx.select("o_orderkey", "o_custkey")
        .join(probe, Seq("o_custkey"))
        .orderBy("o_orderkey")
    }),
    "q_reverse_join" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      import graft.Index.DataFrameOps
      val probe = lk.customers.where(col("c_acctbal") > 9500)
        .select(col("c_custkey").as("o_custkey"), col("c_name"))
      probe.join(lk.ordersIdx, Seq("o_custkey"))
        .select("o_custkey", "c_name", "o_orderkey")
        .orderBy("o_custkey", "o_orderkey")
    }),
    "q_pruned_agg" -> ((s, dir) => {
      val lk = Lake.get(s, dir)
      lk.lineitemIdx.query(Map("l_suppkey" -> SuppKeys))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_regular_join" ->
      s"""SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_acctbal > 9000 ORDER BY o_orderkey""",
    "q_regular_probe" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
          WHERE o_custkey IN ${inList(CustKeys)} ORDER BY o_orderkey""",
    "q_range_probe" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
          WHERE o_orderkey IN ${inList(OrderKeys)} ORDER BY o_orderkey""",
    "q_bloom_probe" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey FROM lineitem
          WHERE l_partkey IN ${inList(PartKeys)} ORDER BY l_orderkey, l_linenumber""",
    "q_computed_probe" ->
      s"""SELECT o_orderkey, month(o_orderdate) AS o_month FROM orders
          WHERE month(o_orderdate) IN ${inList(Months)} ORDER BY o_orderkey""",
    "q_exploded_probe" ->
      s"""SELECT doc_id, u.tok AS tok
          FROM documents, unnest(string_split(text, ' ')) AS u(tok)
          WHERE u.tok IN ${inList(Toks)} ORDER BY doc_id, tok""",
    "q_temporal_latest" ->
      s"""SELECT event_id, user_id, event_type FROM (
            SELECT event_id, user_id, event_type,
                   row_number() OVER (PARTITION BY user_id ORDER BY ts DESC) rn
            FROM events WHERE user_id IN ${inList(UserIds)})
          WHERE rn = 1 ORDER BY user_id, event_id""",
    "q_multicol_and" ->
      s"""SELECT o_orderkey, o_custkey, month(o_orderdate) AS o_month FROM orders
          WHERE o_custkey IN ${inList(CustKeys)}
            AND month(o_orderdate) IN ${inList(Months)} ORDER BY o_orderkey""",
    "q_csv_read" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
          WHERE o_custkey IN ${inList(CustKeys)} ORDER BY o_orderkey""",
    "q_json_read" ->
      s"""SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
          WHERE o_custkey IN ${inList(CustKeys)} ORDER BY o_orderkey""",
    "q_select_join" ->
      s"""SELECT o.o_orderkey, o.o_custkey
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_acctbal > 9500 ORDER BY o_orderkey""",
    "q_reverse_join" ->
      s"""SELECT o.o_custkey, c.c_name, o.o_orderkey
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_acctbal > 9500 ORDER BY o_custkey, o_orderkey""",
    "q_pruned_agg" ->
      s"""SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
                 count(*) AS cnt
          FROM lineitem WHERE l_suppkey IN ${inList(SuppKeys)}
          GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""
  )
}
