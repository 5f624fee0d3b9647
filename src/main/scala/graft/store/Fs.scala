package graft.store

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Thin Hadoop-FS helpers: atomic small-file writes and listing.
  *
  * Works against any Hadoop-compatible filesystem (local, HDFS, object
  * stores with atomic rename). The atomic-replace pattern (write temp +
  * `FileContext.rename(OVERWRITE)`) follows the reference's metadata
  * persistence (reference: IndexMetadataOperations.scala:125-155).
  */
object Fs {
  def hadoopConf(spark: SparkSession) = spark.sparkContext.hadoopConfiguration

  def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(hadoopConf(spark))

  def exists(spark: SparkSession, path: String): Boolean =
    fs(spark, path).exists(new Path(path))

  def mkdirs(spark: SparkSession, path: String): Unit =
    fs(spark, path).mkdirs(new Path(path))

  def delete(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), true)

  def readString(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    try new String(org.apache.commons.io.IOUtils.toByteArray(in), StandardCharsets.UTF_8)
    finally in.close()
  }

  /** Atomically replace `path` with `content`: write to a sibling temp file
    * then rename over the target. Readers see either the old or the new
    * content, never a partial write.
    *
    * On file:// the Hadoop LocalFileSystem implements overwrite-rename as
    * delete-target-then-rename, leaving a window where the target doesn't
    * exist — fatal for lock heartbeats (a waiter reading during the window
    * sees "no lock" and steals it). java.nio ATOMIC_MOVE has no such
    * window; HDFS/object-store renames are atomic server-side. */
  def writeStringAtomic(spark: SparkSession, path: String, content: String): Unit = {
    val target = new Path(path)
    val tmp = new Path(path + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
    val f = fs(spark, path)
    if (target.getParent != null) f.mkdirs(target.getParent)
    val isLocal = f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    if (isLocal) {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        content.getBytes(StandardCharsets.UTF_8))
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmp.toUri.getPath),
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val out = f.create(tmp, true)
      try out.write(content.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val fc = FileContext.getFileContext(target.toUri, hadoopConf(spark))
      fc.rename(tmp, target, Options.Rename.OVERWRITE)
    }
  }

  /** Create `path` exclusively (fails if it exists) — the primitive behind
    * distributed file locks (reference: IndexLock.scala:99-131).
    *
    * Hadoop's LocalFileSystem implements `create(overwrite=false)` as
    * exists-check-then-create — NOT atomic, so two racing writers could
    * both "win" the lock. For file:// schemes we use java.nio CREATE_NEW
    * (O_EXCL, kernel-atomic); remote filesystems (HDFS, stores with
    * conditional create) enforce exclusivity server-side. */
  def createExclusive(spark: SparkSession, path: String, content: String): Boolean = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (p.getParent != null) f.mkdirs(p.getParent)
    val isLocal = f.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem] ||
      f.isInstanceOf[org.apache.hadoop.fs.RawLocalFileSystem]
    if (isLocal) {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p.toUri.getPath),
          content.getBytes(StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: java.io.IOException => false
      }
    } else {
      try {
        val out = f.create(p, false)
        try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }
  }

  def listDirs(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.filter(_.isDirectory).map(_.getPath.getName)
  }

  /** Plain files directly under `path` (non-recursive), skipping dot- and
    * underscore-prefixed names (temp writes, _SUCCESS). */
  def listFiles(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new Path(path)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(_.getPath.getName)
  }

  /** Does the directory hold any data file (ignoring _SUCCESS/_keys/dot
    * files)? Used to exclude manifest-only segments from schema inference. */
  def hasDataFiles(spark: SparkSession, path: String): Boolean = {
    val f = fs(spark, path)
    val p = new Path(path)
    f.exists(p) && f.listStatus(p).exists(s =>
      s.isFile && !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
  }

  def fileSize(spark: SparkSession, path: String): Long =
    fs(spark, path).getFileStatus(new Path(path)).getLen

  def modificationTime(spark: SparkSession, path: String): Long =
    fs(spark, path).getFileStatus(new Path(path)).getModificationTime
}
