package graft.store

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession

import graft.GraftConf

/** Distributed file-based lock over any Hadoop FS with atomic exclusive
  * create (reference: IndexLock.scala:99-246).
  *
  *  - acquire = atomic `create(overwrite=false)` of a JSON lock file
  *  - exponential backoff starting at `lockRetryBaseMs`, capped at 60 s
  *  - staleness is judged from `lastRefreshedAtMs`: a holder running a long
  *    operation HEARTBEATS (rewrites the lock with a fresh timestamp), so an
  *    ACTIVE holder is never healed no matter how long the operation runs —
  *    only a crashed holder (no refresh for `lockTimeoutSec`) is
  *    (reference: IndexLock.scala lastRefreshedAt + refresh())
  *  - `withLock` runs the heartbeat automatically on a daemon thread at
  *    `lockTimeoutSec / 4`, so every call site (multi-batch builds, storage
  *    migrations) is covered without remembering to heartbeat
  *  - release verifies the lock file still names THIS holder before
  *    deleting: if the lock was (wrongly or rightly) healed and re-acquired
  *    by someone else, release is a no-op instead of destroying the new
  *    holder's mutual exclusion
  *  - corrupt lock files (unparseable) are healed with a depth guard so two
  *    writers can't heal-loop forever
  *  - gives up with [[LockTimeoutException]] after `lockMaxWaitSec`
  */
final class GraftLock(spark: SparkSession, path: String) extends Logging {
  private val holder = java.util.UUID.randomUUID().toString

  private def lockContent(acquiredAtMs: Long): String = {
    val now = System.currentTimeMillis()
    s"""{"holder":"$holder","acquiredAtMs":$acquiredAtMs,"lastRefreshedAtMs":$now}"""
  }

  private def field(content: String, name: String): Option[String] =
    ("\"" + name + "\"\\s*:\\s*\"?([^\",}]+)").r
      .findFirstMatchIn(content).map(_.group(1))

  private case class LockState(holder: String, acquiredAtMs: Long, refreshedAtMs: Long)

  /** Parsed state of the current lock file. `refreshedAtMs` falls back to
    * acquiredAtMs for lock files written before heartbeat support existed. */
  private def readLock(): Option[LockState] =
    try {
      val content = Fs.readString(spark, path)
      def longField(n: String): Option[Long] =
        field(content, n).flatMap(s => scala.util.Try(s.trim.toLong).toOption)
      for {
        h <- field(content, "holder")
        acq <- longField("acquiredAtMs")
      } yield LockState(h, acq, longField("lastRefreshedAtMs").getOrElse(acq))
    } catch {
      case _: Exception => None // unreadable/corrupt/deleted-in-flight
    }

  def tryAcquire(): Boolean =
    Fs.createExclusive(spark, path, lockContent(System.currentTimeMillis()))

  def acquire(): Unit = {
    val timeoutMs = GraftConf.lockTimeoutSec(spark) * 1000L
    val maxWaitMs = GraftConf.lockMaxWaitSec(spark) * 1000L
    val baseMs = GraftConf.lockRetryBaseMs(spark)
    val start = System.currentTimeMillis()
    var attempt = 0
    var healAttempts = 0
    while (!tryAcquire()) {
      if (Fs.exists(spark, path)) {
        val stale = readLock() match {
          case Some(st) => System.currentTimeMillis() - st.refreshedAtMs > timeoutMs
          case None     => healAttempts < 3 // corrupt → heal, depth-guarded
        }
        if (stale) {
          healAttempts += 1
          logWarning(s"healing stale/corrupt lock $path (attempt $healAttempts)")
          Fs.delete(spark, path)
        }
      }
      if (System.currentTimeMillis() - start > maxWaitMs)
        throw new LockTimeoutException(path, maxWaitMs)
      val sleep = math.min(baseMs * (1L << math.min(attempt, 16)), 60000L)
      Thread.sleep(sleep)
      attempt += 1
    }
  }

  /** Heartbeat: rewrite the lock with a fresh `lastRefreshedAtMs` iff we
    * still hold it. Returns false (and logs) if the lock was lost — healed
    * by a waiter and possibly re-acquired. Atomic replace, so a concurrent
    * reader sees old or new content, never a torn write. */
  def refresh(): Boolean = readLock() match {
    case Some(st) if st.holder == holder =>
      Fs.writeStringAtomic(spark, path, lockContent(st.acquiredAtMs))
      true
    case other =>
      logWarning(s"lock $path no longer held by this instance " +
        s"(found: ${other.map(_.holder)}) — refresh skipped")
      false
  }

  def refreshOrThrow(): Unit =
    if (!refresh()) throw new LockLostException(path)

  /** Delete the lock only if WE still hold it (reference: release verifies
    * correlationId before deleting). A lost lock is logged and left alone. */
  def release(): Unit = readLock() match {
    case Some(st) if st.holder == holder => Fs.delete(spark, path)
    case None => Fs.delete(spark, path) // corrupt/unreadable: our best effort
    case Some(st) =>
      logWarning(s"lock $path now held by ${st.holder} (ours was healed) — not deleting")
  }

  /** Acquire, run `body` with an automatic heartbeat every
    * `lockTimeoutSec / 4` seconds, then release. The heartbeat guarantees a
    * live holder is never healed by a waiter, however long `body` runs
    * (hours-long 100 TB builds are the expected case). */
  def withLock[T](body: => T): T = {
    acquire()
    val intervalMs = math.max(GraftConf.lockTimeoutSec(spark) * 1000L / 4, 250L)
    @volatile var running = true
    val beat = new Thread(() => {
      while (running) {
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () }
        if (running) {
          try refresh()
          catch { case e: Exception => logWarning(s"lock heartbeat failed: $e") }
        }
      }
    }, s"graft-lock-heartbeat-${path.hashCode}")
    beat.setDaemon(true)
    beat.start()
    try body
    finally {
      running = false
      beat.interrupt()
      release()
    }
  }
}

class LockTimeoutException(path: String, waitedMs: Long)
  extends RuntimeException(s"could not acquire lock $path within ${waitedMs}ms")
  with graft.GraftException

class LockLostException(path: String)
  extends RuntimeException(
    s"lock $path was healed by another writer while this holder was active")
  with graft.GraftException
