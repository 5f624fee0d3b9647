package graft

import org.apache.spark.sql.functions._

import graft.harness.Lake

/** SQL surface: catalog table reads, WHERE pushdown pruning, join rewrite —
  * including the reference's strongest test idea: SQL results must equal the
  * programmatic index.join results (ref: AriadneCatalogTests "SQL JOIN
  * matches programmatic index.join results"), plus fallback cases. */
class SqlCatalogSpec extends GraftSuite {
  lazy val lake: Lake = Lake.get(spark, sf)

  private def init(): Unit = {
    lake.ordersIdx
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    if (!spark.experimental.extraOptimizations.contains(graft.catalog.GraftJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.catalog.GraftJoinRule
  }

  test("SELECT * FROM catalog table equals full scan") {
    init()
    val got = spark.sql("SELECT o_orderkey, o_custkey FROM graft.orders_idx")
    assertSameRows(got, lake.orders.select("o_orderkey", "o_custkey"))
  }

  test("WHERE IN over indexed column matches plain filter") {
    init()
    val got = spark.sql(
      "SELECT o_orderkey, o_custkey FROM graft.orders_idx WHERE o_custkey IN (1, 7, 42)")
    val want = lake.orders.where(col("o_custkey").isin(1L, 7L, 42L))
      .select("o_orderkey", "o_custkey")
    assertSameRows(got, want)
  }

  test("WHERE on unindexed column still answers correctly (no pruning)") {
    init()
    val got = spark.sql(
      "SELECT o_orderkey FROM graft.orders_idx WHERE o_orderstatus = 'F'")
    val want = lake.orders.where(col("o_orderstatus") === "F").select("o_orderkey")
    assertSameRows(got, want)
  }

  test("WHERE BETWEEN on range-indexed column prunes files and stays exact") {
    init()
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      graft.operators.IndexJoin.lastMetrics = None
      // the split is banded on o_custkey, so mid-range o_orderkey windows
      // overlap every file; a window at the very top of the key range is
      // only reachable by the few files whose max lands there
      val top = lake.orders.agg(max("o_orderkey")).first().getLong(0)
      val got = spark.sql(
        s"""SELECT o_orderkey, o_custkey FROM graft.orders_idx
            WHERE o_orderkey BETWEEN ${top - 5} AND $top""")
      val want = lake.orders
        .where(col("o_orderkey").between(top - 5, top))
        .select("o_orderkey", "o_custkey")
      assertSameRows(got, want)
      val m = graft.operators.IndexJoin.lastMetrics
      assert(m.nonEmpty, "scan did not record pruning metrics")
      assert(m.get.locatedFiles < m.get.totalFiles,
        s"range pushdown should read a strict subset of files: $m")
    } finally spark.conf.set("spark.graft.metricsEnabled", "false")
  }

  test("one-sided range filter (>=) prunes; unindexed comparison does not push") {
    init()
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      graft.operators.IndexJoin.lastMetrics = None
      val got = spark.sql(
        "SELECT o_orderkey FROM graft.orders_idx WHERE o_orderkey >= 7200")
      val want = lake.orders.where(col("o_orderkey") >= 7200L).select("o_orderkey")
      assertSameRows(got, want)
      val m = graft.operators.IndexJoin.lastMetrics
      assert(m.nonEmpty && m.get.locatedFiles < m.get.totalFiles,
        s"expected >= pushdown pruning: $m")
      // comparison on a column with only a REGULAR index must not prune
      graft.operators.IndexJoin.lastMetrics = None
      val noPrune = spark.sql(
        "SELECT o_orderkey FROM graft.orders_idx WHERE o_custkey > 100")
      val wantAll = lake.orders.where(col("o_custkey") > 100L).select("o_orderkey")
      assertSameRows(noPrune, wantAll)
    } finally spark.conf.set("spark.graft.metricsEnabled", "false")
  }

  test("temporal catalog table: ts-range filter must not resurrect stale versions") {
    init()
    lake.eventsIdx
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc)
    val latest = lake.events.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    val b = lake.events.selectExpr(
      "min(unix_micros(cast(ts as timestamp)))",
      "max(unix_micros(cast(ts as timestamp)))").first()
    val loUs = b.getLong(0)
    val hiUs = (b.getLong(0) + b.getLong(1)) / 2
    def ntz(us: Long) = s"cast(timestamp_micros(${us}L) as timestamp_ntz)"
    val (lo, hi) = (expr(ntz(loUs)), expr(ntz(hiUs)))
    // non-vacuous: users whose LATEST event is after the window exist, and
    // they have older events inside it — pruning by ts bounds would read
    // only in-window files and resurrect those stale rows
    assert(latest.where(col("ts") > hi).count() > 0)
    val got = spark.sql(
      s"""SELECT event_id, user_id FROM graft.events_idx
          WHERE ts BETWEEN ${ntz(loUs)} AND ${ntz(hiUs)}""")
    val want = latest.where(col("ts") >= lo && col("ts") <= hi)
      .select("event_id", "user_id")
    assertSameRows(got, want)
  }

  test("temporal catalog table: key equality still prunes files safely") {
    init()
    lake.eventsIdx
    spark.conf.set("spark.graft.metricsEnabled", "true")
    try {
      graft.operators.IndexJoin.lastMetrics = None
      val got = spark.sql(
        "SELECT event_id, user_id FROM graft.events_idx WHERE user_id IN (1, 3, 7)")
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc)
      val want = lake.events.where(col("user_id").isin(1L, 3L, 7L))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select("event_id", "user_id")
      assertSameRows(got, want)
      val m = graft.operators.IndexJoin.lastMetrics
      assert(m.nonEmpty && m.get.locatedFiles < m.get.totalFiles,
        s"temporal key probe should prune: $m")
    } finally spark.conf.set("spark.graft.metricsEnabled", "false")
  }

  test("SQL JOIN matches programmatic index.join and gets rewritten") {
    init()
    lake.customers.where(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("o_custkey"))
      .createOrReplaceTempView("sql_probe")
    val sqlDf = spark.sql(
      """SELECT o.o_orderkey, o.o_custkey FROM graft.orders_idx o
         JOIN sql_probe p ON o.o_custkey = p.o_custkey""")
    assert(!sqlDf.queryExecution.optimizedPlan.toString.contains("graft.orders_idx"),
      "join rewrite did not fire")
    val prog = lake.ordersIdx.join(
      lake.customers.where(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"))
      .select("o_orderkey", "o_custkey")
    assertSameRows(sqlDf, prog)
  }

  test("non-equi join falls back unrewritten but correct") {
    init()
    lake.customers.limit(3).select(col("c_custkey")).createOrReplaceTempView("ne_probe")
    val sqlDf = spark.sql(
      """SELECT o.o_orderkey FROM graft.orders_idx o
         JOIN ne_probe p ON o.o_custkey < p.c_custkey""")
    assert(sqlDf.queryExecution.optimizedPlan.toString.contains("orders_idx"),
      "non-equi join must not be rewritten")
    val probe = lake.customers.limit(3).select("c_custkey")
    val want = lake.orders.join(probe, col("o_custkey") < col("c_custkey"))
      .select("o_orderkey")
    assert(sqlDf.count() == want.count())
  }

  test("LEFT OUTER join is not rewritten (INNER only)") {
    init()
    lake.customers.where(col("c_acctbal") > 9000)
      .select(col("c_custkey")).createOrReplaceTempView("lo_probe")
    val sqlDf = spark.sql(
      """SELECT o.o_orderkey, p.c_custkey FROM graft.orders_idx o
         LEFT OUTER JOIN lo_probe p ON o.o_custkey = p.c_custkey""")
    assert(sqlDf.queryExecution.optimizedPlan.toString.contains("orders_idx"))
    assert(sqlDf.count() == lake.orders.count())
  }

  test("user filter above the relation survives the rewrite") {
    init()
    lake.customers.where(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("o_custkey")).createOrReplaceTempView("uf_probe")
    val sqlDf = spark.sql(
      """SELECT o.o_orderkey FROM graft.orders_idx o
         JOIN uf_probe p ON o.o_custkey = p.o_custkey
         WHERE o.o_orderstatus = 'F'""")
    val want = lake.orders
      .join(lake.customers.where(col("c_acctbal") > 9000)
        .select(col("c_custkey").as("o_custkey")), Seq("o_custkey"))
      .where(col("o_orderstatus") === "F").select("o_orderkey")
    assertSameRows(sqlDf.select("o_orderkey"), want)
  }

  test("SHOW TABLES lists indexes; DDL is rejected") {
    init()
    val tables = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(tables.contains("orders_idx"))
    intercept[Exception] {
      spark.sql("DROP TABLE graft.orders_idx")
    }
  }

  test("DESCRIBE TABLE exposes the stored schema") {
    init()
    val cols = spark.sql("DESCRIBE TABLE graft.orders_idx")
      .collect().map(_.getString(0)).toSet
    assert(Set("o_orderkey", "o_custkey", "o_orderdate").subsetOf(cols))
  }

  test("3-part name via default namespace resolves") {
    init()
    val n = spark.sql("SELECT count(*) AS c FROM graft.default.orders_idx")
      .first().getLong(0)
    assert(n == lake.orders.count())
  }

  test("property: random pushdown predicates equal raw-table filters, all index types") {
    init()
    lake.lineitemIdx
    lake.eventsIdx
    val rnd = new scala.util.Random(20260814)
    import org.apache.spark.sql.Column
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))
    // random AND/OR trees over leaf predicates: indexed-equality, indexed-
    // range, IN lists, and UNINDEXED columns mixed in — pruning decisions
    // interact across conjuncts, which is exactly what hand-written guard
    // tests cannot enumerate
    def tree(depth: Int, leaf: () => (String, Column)): (String, Column) =
      if (depth == 0 || rnd.nextInt(3) == 0) leaf()
      else {
        val (ls, lc) = tree(depth - 1, leaf)
        val (rs, rc) = tree(depth - 1, leaf)
        if (rnd.nextBoolean()) (s"($ls) AND ($rs)", lc && rc)
        else (s"($ls) OR ($rs)", lc || rc)
      }

    // orders: regular(o_custkey) + range(o_orderkey) + unindexed status
    val custKeys = lake.orders.select("o_custkey").distinct().limit(100)
      .collect().map(_.getLong(0)).toSeq
    val okB = lake.orders.agg(min("o_orderkey"), max("o_orderkey")).first()
    val (okLo, okHi) = (okB.getLong(0), okB.getLong(1))
    def okRand(): Long = okLo + math.abs(rnd.nextLong()) % (okHi - okLo + 1)
    def ordersLeaf(): (String, Column) = rnd.nextInt(6) match {
      case 0 =>
        val k = pick(custKeys); (s"o_custkey = $k", col("o_custkey") === k)
      case 1 =>
        val ks = Seq.fill(1 + rnd.nextInt(4))(pick(custKeys)).distinct
        (s"o_custkey IN (${ks.mkString(", ")})", col("o_custkey").isin(ks: _*))
      case 2 =>
        val a = okRand(); val b = a + rnd.nextInt(500)
        (s"o_orderkey BETWEEN $a AND $b", col("o_orderkey").between(a, b))
      case 3 =>
        val a = okRand(); (s"o_orderkey >= $a", col("o_orderkey") >= a)
      case 4 =>
        val a = okRand(); (s"o_orderkey = $a", col("o_orderkey") === a)
      case 5 =>
        val st = pick(Seq("F", "O", "P"))
        (s"o_orderstatus = '$st'", col("o_orderstatus") === st)
    }
    for (trial <- 1 to 20) {
      val (sql, c) = tree(2, () => ordersLeaf())
      val got = spark.sql(
        s"SELECT o_orderkey, o_custkey FROM graft.orders_idx WHERE $sql")
      val want = lake.orders.where(c).select("o_orderkey", "o_custkey")
      withClue(s"orders trial $trial: WHERE $sql\n") { assertSameRows(got, want) }
    }

    // lineitem: bloom(l_partkey) + regular(l_suppkey)
    val partKeys = lake.lineitem.select("l_partkey").distinct().limit(100)
      .collect().map(_.getLong(0)).toSeq
    val suppKeys = lake.lineitem.select("l_suppkey").distinct().limit(50)
      .collect().map(_.getLong(0)).toSeq
    def lineitemLeaf(): (String, Column) = rnd.nextInt(3) match {
      case 0 =>
        val k = pick(partKeys); (s"l_partkey = $k", col("l_partkey") === k)
      case 1 =>
        val ks = Seq.fill(1 + rnd.nextInt(3))(pick(suppKeys)).distinct
        (s"l_suppkey IN (${ks.mkString(", ")})", col("l_suppkey").isin(ks: _*))
      case 2 =>
        val q = 1 + rnd.nextInt(40)
        (s"l_quantity >= $q", col("l_quantity") >= q) // unindexed
    }
    for (trial <- 1 to 10) {
      val (sql, c) = tree(1, () => lineitemLeaf())
      val got = spark.sql(
        s"SELECT l_orderkey, l_partkey, l_suppkey FROM graft.lineitem_idx WHERE $sql")
      val want = lake.lineitem.where(c)
        .select("l_orderkey", "l_partkey", "l_suppkey")
      withClue(s"lineitem trial $trial: WHERE $sql\n") { assertSameRows(got, want) }
    }

    // events: temporal(user_id by ts) + range(ts) — the catalog serves the
    // LATEST row per user; random ts-range predicates must never resurrect
    // stale versions (the temporal-safety guard), whatever they combine with
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc)
    val latest = lake.events.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn").cache()
    val userIds = lake.events.select("user_id").distinct().limit(50)
      .collect().map(_.getLong(0)).toSeq
    val tsB = lake.events.selectExpr(
      "min(unix_micros(cast(ts as timestamp)))",
      "max(unix_micros(cast(ts as timestamp)))").first()
    val (tsLo, tsHi) = (tsB.getLong(0), tsB.getLong(1))
    def ntz(us: Long) = s"cast(timestamp_micros(${us}L) as timestamp_ntz)"
    def tsRand(): Long = tsLo + math.abs(rnd.nextLong()) % (tsHi - tsLo + 1)
    def eventsLeaf(): (String, Column) = rnd.nextInt(4) match {
      case 0 =>
        val u = pick(userIds); (s"user_id = $u", col("user_id") === u)
      case 1 =>
        val us = Seq.fill(1 + rnd.nextInt(4))(pick(userIds)).distinct
        (s"user_id IN (${us.mkString(", ")})", col("user_id").isin(us: _*))
      case 2 =>
        val (a, b) = { val x = tsRand(); val y = tsRand(); (math.min(x, y), math.max(x, y)) }
        (s"ts BETWEEN ${ntz(a)} AND ${ntz(b)}",
          col("ts").between(expr(ntz(a)), expr(ntz(b))))
      case 3 =>
        val a = tsRand(); (s"ts >= ${ntz(a)}", col("ts") >= expr(ntz(a)))
    }
    for (trial <- 1 to 15) {
      val (sql, c) = tree(2, () => eventsLeaf())
      val got = spark.sql(
        s"SELECT event_id, user_id FROM graft.events_idx WHERE $sql")
      val want = latest.where(c).select("event_id", "user_id")
      withClue(s"events trial $trial: WHERE $sql\n") { assertSameRows(got, want) }
    }
  }

  test("join of TWO graft tables stays correct (one side rewritten, other scanned)") {
    init()
    lake.lineitemIdx // second catalog table (regular index on l_suppkey)
    val got = spark.sql(
      """SELECT o.o_orderkey, l.l_suppkey
         FROM graft.orders_idx o JOIN graft.lineitem_idx l
           ON o.o_orderkey = l.l_orderkey
         WHERE l.l_suppkey IN (2, 5)""")
    val want = lake.orders.join(
        lake.lineitem.where(col("l_suppkey").isin(2L, 5L)),
        col("o_orderkey") === col("l_orderkey"))
      .select("o_orderkey", "l_suppkey")
    assertSameRows(got, want)
  }

  test("broadcast-hint rule: a pruned graft table plans STATICALLY as " +
      "the broadcast side (the V1ScanWrapper hides the scan's size, so " +
      "without the rule every such join sort-merges); results identical") {
    init()
    if (!spark.experimental.extraOptimizations
        .contains(graft.catalog.GraftBroadcastHintRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.catalog.GraftBroadcastHintRule
    // a non-broadcastable big probe side (range → size estimate ~46 MB)
    spark.range(0, 3000000)
      .select(col("id").as("o_orderkey"), (col("id") % 97).as("pay"))
      .createOrReplaceTempView("sqlcat_big")
    // a LEFT join: GraftJoinRule rewrites only INNER equi-joins, so the
    // graft side survives as the V1 scan whose size the wrapper hides —
    // exactly the case the hint rule exists for (the filter sits INSIDE
    // the subquery; a WHERE above the join would let the optimizer
    // convert the outer join to inner and re-admit the rewrite)
    val q =
      """SELECT b.pay, o.o_orderkey
         FROM sqlcat_big b LEFT JOIN
           (SELECT o_orderkey FROM graft.orders_idx WHERE o_custkey = 5) o
           ON b.o_orderkey = o.o_orderkey"""
    val withStats = spark.sql(q)
    val plan = withStats.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"pruned graft side must broadcast statically:\n${plan.take(800)}")
    spark.conf.set("spark.graft.reportStatistics", "false")
    try {
      val off = spark.sql(q)
      val offPlan = off.queryExecution.executedPlan.toString
      assert(!offPlan.contains("BroadcastHashJoin") &&
        offPlan.contains("SortMergeJoin"),
        s"without statistics the join must sort-merge:\n${offPlan.take(800)}")
      assertSameRows(withStats, off)
    } finally spark.conf.unset("spark.graft.reportStatistics")
  }
}
