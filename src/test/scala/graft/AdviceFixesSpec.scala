package graft

import org.apache.spark.sql.functions._

import graft.store.{Fs, GraftLock, SnapshotTable}
import graft.streaming.StreamIngest

/** Regression tests for the round-2 advisor findings: lock heartbeat +
  * ownership-checked release, snapshot schema-cache invalidation across
  * drop/recreate, and streaming replay file hygiene. */
class AdviceFixesSpec extends GraftSuite {

  test("lock heartbeat keeps a long-running holder alive past lockTimeoutSec") {
    val path = tmpDir("graft_hb_") + "/.hb.lock"
    spark.conf.set("spark.graft.lockTimeoutSec", "1")
    spark.conf.set("spark.graft.lockMaxWaitSec", "3")
    spark.conf.set("spark.graft.lockRetryBaseMs", "100")
    try {
      val l1 = new GraftLock(spark, path)
      val l2 = new GraftLock(spark, path)
      @volatile var holderDone = false
      val t = new Thread(() => l1.withLock {
        Thread.sleep(4000) // 4x the stale timeout — heartbeat must cover it
        holderDone = true
      })
      t.start()
      Thread.sleep(500)
      // the waiter must NOT heal the active (heartbeating) holder's lock
      intercept[graft.store.LockTimeoutException](l2.acquire())
      assert(!holderDone, "holder should still be running when waiter gave up")
      t.join()
      assert(!Fs.exists(spark, path), "lock must be released after withLock")
      assert(l2.tryAcquire()); l2.release()
    } finally {
      spark.conf.unset("spark.graft.lockTimeoutSec")
      spark.conf.unset("spark.graft.lockMaxWaitSec")
      spark.conf.unset("spark.graft.lockRetryBaseMs")
    }
  }

  test("release after a heal does not destroy the new holder's lock") {
    val path = tmpDir("graft_own_") + "/.own.lock"
    val l1 = new GraftLock(spark, path)
    val l2 = new GraftLock(spark, path)
    assert(l1.tryAcquire())
    // simulate a waiter healing l1's (supposedly stale) lock and acquiring
    Fs.delete(spark, path)
    assert(l2.tryAcquire())
    // l1's release must detect it no longer owns the lock and no-op
    l1.release()
    assert(Fs.exists(spark, path), "l2's lock must survive l1's release")
    assert(!l1.refresh(), "refresh must report the lock as lost")
    l2.release()
    assert(!Fs.exists(spark, path))
  }

  test("snapshot schema cache does not leak across drop + recreate") {
    import spark.implicits._
    val root = tmpDir("graft_nonce_") + "/table"
    val t1 = new SnapshotTable(spark, root)
    t1.overwrite(Seq((1L, "a")).toDF("k", "v_old"))
    assert(t1.read().get.columns.contains("v_old"))
    // simulate ANOTHER process dropping + recreating: delete the directory
    // without going through this JVM's drop() (no cache invalidation), then
    // write a differently-shaped v1
    Fs.delete(spark, root)
    val t2 = new SnapshotTable(spark, root)
    t2.overwrite(Seq((1L, 42L)).toDF("k", "v_new"))
    assert(t2.currentVersion.contains(1L), "recreated table restarts at v1")
    val cols = t1.read().get.columns.toSeq
    assert(cols.contains("v_new") && !cols.contains("v_old"),
      s"stale cached schema served after recreate: $cols")
  }

  test("replayed micro-batch fully replaces its registration (no dangling files)") {
    import spark.implicits._
    val dataDir = tmpDir("graft_replay_")
    val schema = Seq((1L, "a")).toDF("id", "v").schema
    val idx = Index(spark, "replay_idx", schema, "parquet")
    idx.addIndex("id")
    StreamIngest.ingestBatch(idx, dataDir)(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    val filesFirst = idx.files
    // replay batch 0 with different content (non-deterministic source)
    StreamIngest.ingestBatch(idx, dataDir)(Seq((3L, "c"), (4L, "d")).toDF("id", "v"), 0L)
    val filesSecond = idx.files
    assert(filesSecond.size == filesFirst.size,
      s"replay must not grow the ledger: $filesSecond")
    // every registered file must exist on disk
    filesSecond.foreach(f => assert(Fs.exists(spark, f), s"dangling registration $f"))
    // index must answer from the REPLAYED content only
    assert(idx.query(Map("id" -> Seq(3L, 4L))).count() == 2)
    assert(idx.query(Map("id" -> Seq(1L, 2L))).count() == 0)
    assert(idx.unindexedFiles.isEmpty)
  }

  test("broadcast set membership matches isin and stays UDF-free (r5)") {
    import spark.implicits._
    import graft.functions.BroadcastSets
    val longs = (1L to 500L).toDF("v")
    val longVals = (1L to 300L by 3L).toSeq
    val viaExpr = longs.where(
      BroadcastSets.longSetContains(spark, longVals)(col("v")))
    val viaIsin = longs.where(col("v").isin(longVals: _*))
    assert(viaExpr.collect().map(_.getLong(0)).toSet ==
      viaIsin.collect().map(_.getLong(0)).toSet)
    // null input drops the row, exactly like isin in a WHERE
    val withNull = Seq[java.lang.Long](1L, null, 7L).toDF("v")
    assert(withNull.where(BroadcastSets.longSetContains(spark, Seq(1L, 2L))(col("v")))
      .count() == 1)

    val strs = Seq("a", "b", "c", "d", "é", "").toDF("s")
    val strVals = Seq("b", "é", "", "missing")
    val gotS = strs.where(BroadcastSets.stringSetContains(spark, strVals)(col("s")))
      .collect().map(_.getString(0)).toSet
    val wantS = strs.where(col("s").isin(strVals: _*))
      .collect().map(_.getString(0)).toSet
    assert(gotS == wantS)
    // the filter compiles into the codegen'd scan stage — no UDF barrier
    val plan = viaExpr.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), s"expected UDF-free plan:\n$plan")
  }

  // ---- round-6 advisor lows ------------------------------------------------

  test("weightedSample rejects zero, negative, and null weights loudly") {
    import spark.implicits._
    import graft.operators.Sampling
    val ok = Seq(("a", 1.0), ("b", 2.0), ("c", 3.0)).toDF("id", "w")
    assert(Sampling.weightedSample(ok, "id", "w", 2).count() == 2)
    for (bad <- Seq(0.0, -1.5)) {
      val df = Seq(("a", 1.0), ("b", bad)).toDF("id", "w")
      val e = intercept[Exception] {
        Sampling.weightedSample(df, "id", "w", 2).collect()
      }
      assert(e.getMessage.contains("strictly positive"),
        s"weight=$bad: ${e.getMessage}")
    }
    val withNull = Seq(("a", java.lang.Double.valueOf(1.0)), ("b", null))
      .toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.weightedSample(withNull, "id", "w", 2).collect()
    }
    assert(e.getMessage.contains("strictly positive"))
  }

  test("Profile.table n_rows is the table row count even on nullable columns") {
    import spark.implicits._
    import graft.operators.Profile
    val df = Seq[(java.lang.Long, String)]((1L, "x"), (null, "y"), (3L, null))
      .toDF("num", "str")
    val rows = Profile.table(df, Seq("num", "str")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("num") == ((3L, 1L)), "n_rows must be 3 with 1 null")
    assert(rows("str") == ((3L, 1L)))
  }

  test("Profile.quantiles handles column names that need backticks") {
    import spark.implicits._
    import graft.operators.Profile
    val df = Seq(1.0, 2.0, 3.0, 4.0, 5.0).toDF("weird name-1.x")
    val got = Profile.quantiles(df, "weird name-1.x", Seq(0.5))
      .collect().head.getDouble(1)
    assert(got == 3.0)
    // approx path takes the same Column route
    val ap = Profile.quantiles(df, "weird name-1.x", Seq(0.5), exact = false)
      .collect().head.getDouble(1)
    assert(math.abs(ap - 3.0) <= 1.0)
  }

  test("trainLogOdds rejects null and out-of-domain labels loudly") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val ok = Seq(("good fast text", 1), ("bad slow text", 0)).toDF("text", "y")
    val (w, _) = TextAnalysis.trainLogOdds(ok, "text", "y", topN = 100)
    assert(w.nonEmpty && w("fast") > 0 && w("slow") < 0)
    val badVal = Seq(("a b", 1), ("c d", 2)).toDF("text", "y")
    val e1 = intercept[Exception] {
      TextAnalysis.trainLogOdds(badVal, "text", "y", topN = 10)
    }
    assert(e1.getMessage.contains("must be 0 or 1"))
    val badNull = Seq(("a b", java.lang.Integer.valueOf(1)), ("c d", null))
      .toDF("text", "y")
    val e2 = intercept[Exception] {
      TextAnalysis.trainLogOdds(badNull, "text", "y", topN = 10)
    }
    assert(e2.getMessage.contains("must be 0 or 1"))
  }
}
