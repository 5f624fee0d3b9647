package graft.store

import org.apache.spark.internal.Logging
import org.apache.spark.sql.SparkSession

import graft.GraftConf

/** Distributed file-based lock over any Hadoop FS with atomic exclusive
  * create (reference: IndexLock.scala:99-246).
  *
  *  - acquire = atomic `create(overwrite=false)` of a JSON lock file
  *  - exponential backoff starting at `lockRetryBaseMs`, capped at 60 s
  *  - a lock older than `lockTimeoutSec` is considered abandoned (crashed
  *    holder) and healed: deleted, then acquisition retried
  *  - corrupt lock files (unparseable) are healed the same way, with a
  *    depth guard so two writers can't heal-loop forever
  *  - gives up with [[LockTimeoutException]] after `lockMaxWaitSec`
  */
final class GraftLock(spark: SparkSession, path: String) extends Logging {
  private val holder = java.util.UUID.randomUUID().toString

  private def lockContent: String =
    s"""{"holder":"$holder","acquiredAtMs":${System.currentTimeMillis()}}"""

  private def lockAgeMs(): Option[Long] =
    try {
      val content = Fs.readString(spark, path)
      val ts = "\"acquiredAtMs\"\\s*:\\s*(\\d+)".r.findFirstMatchIn(content)
        .map(_.group(1).toLong)
      ts.map(System.currentTimeMillis() - _)
    } catch {
      case _: Exception => None // unreadable/corrupt/deleted-in-flight
    }

  def tryAcquire(): Boolean = Fs.createExclusive(spark, path, lockContent)

  def acquire(): Unit = {
    val timeoutMs = GraftConf.lockTimeoutSec(spark) * 1000L
    val maxWaitMs = GraftConf.lockMaxWaitSec(spark) * 1000L
    val baseMs = GraftConf.lockRetryBaseMs(spark)
    val start = System.currentTimeMillis()
    var attempt = 0
    var healAttempts = 0
    while (!tryAcquire()) {
      if (Fs.exists(spark, path)) {
        val stale = lockAgeMs() match {
          case Some(age) => age > timeoutMs
          case None      => healAttempts < 3 // corrupt → heal, depth-guarded
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

  def release(): Unit = Fs.delete(spark, path)

  def withLock[T](body: => T): T = {
    acquire()
    try body finally release()
  }
}

class LockTimeoutException(path: String, waitedMs: Long)
  extends RuntimeException(s"could not acquire lock $path within ${waitedMs}ms")
