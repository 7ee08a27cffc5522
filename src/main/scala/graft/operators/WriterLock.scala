package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** FAIL-LOUD single-writer guard for the TABLE-backed maintenance ops —
  * the r15 verdict's #6 for the surface [[graft.sources.SnapshotStore]]
  * does not cover: the live ingest-compact loop plus a second
  * concurrent compactor/retractor on the same bucketed table was
  * UNDEFINED (keep-first idempotence protects replays of one writer,
  * not interleaved writers — two concurrent anti-join+append cycles can
  * both admit the same key). The snapshot store solves this with
  * optimistic version commits; the table path gets the blunter
  * instrument: an exclusive lock file created atomically
  * (`create(overwrite = false)`) under the warehouse `_locks/`
  * directory, held for the duration of one maintenance step. A second
  * writer is REFUSED with [[WriterLock.LockHeldException]] — serialized
  * or refused, never interleaved (WriterLockSpec).
  *
  * Crash semantics: a writer that dies mid-step leaves its lock file
  * (fail-stop, not fail-silent — the next writer refuses and an
  * operator inspects the owner line written inside, then [[break]]s
  * the lock once the dead writer is confirmed gone). Lease-based
  * expiry would trade that manual step for clock coupling; for a
  * nightly maintenance window, loud-and-manual is the right default.
  *
  * Acquisition atomicity is the backing store's create-exclusive: a
  * single namenode op on HDFS, but Hadoop's LOCAL filesystems
  * implement `create(overwrite = false)` as a non-atomic exists check
  * followed by create (the r16 ADVICE finding — two racers in that
  * window could both "acquire"), so `file:` URIs route through
  * java.nio `Files.createFile`, O_EXCL at the syscall level
  * (WriterLockSpec races 16 threads through it). S3-style object
  * stores provide no atomic create at all — there this lock needs a
  * conditional-put or external lock service, the same seam as
  * [[graft.sources.SnapshotStore.ClaimArm]].
  */
object WriterLock {

  class LockHeldException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

  private def lockPath(spark: SparkSession, name: String): Path =
    new Path(new Path(spark.conf.get("spark.sql.warehouse.dir"), "_locks"),
      s"$name.lock")

  /** Run `body` holding the exclusive maintenance lock for `name`
    * (conventionally the table being maintained). Throws
    * [[LockHeldException]] — without running `body` — if another
    * writer holds it. */
  def withLock[T](spark: SparkSession, name: String)(body: => T): T = {
    val p = lockPath(spark, name)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    val owner = s"${java.lang.management.ManagementFactory
      .getRuntimeMXBean.getName}\n".getBytes("UTF-8")
    def refused(e: Throwable) = new LockHeldException(
      s"maintenance lock $p is held by another writer — a second " +
        "concurrent compactor/retractor on one table would " +
        "interleave; wait for it, or WriterLock.break() after " +
        "confirming the holder is dead", e)
    if (fs.getScheme == "file") {
      // O_EXCL via java.nio: Hadoop's local create(overwrite=false) is
      // exists-then-create, not atomic (scaladoc)
      val nio = java.nio.file.Paths.get(p.toUri.getPath)
      try java.nio.file.Files.write(nio, owner,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      catch { case e: java.nio.file.FileAlreadyExistsException =>
        throw refused(e)
      }
      try body finally fs.delete(p, false)
    } else {
      val out =
        try fs.create(p, false)
        catch { case e: java.io.IOException => throw refused(e) }
      try {
        out.write(owner)
        out.close()
        body
      } finally fs.delete(p, false)
    }
  }

  /** Forcibly remove a lock left by a confirmed-dead writer. */
  def break(spark: SparkSession, name: String): Boolean = {
    val p = lockPath(spark, name)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, false)
  }
}
