package graft.lake

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.SparkSession

/** Serializes snapshot manifest publishes on filesystems that lack an
  * atomic create-if-absent primitive (s3a/gs/abfs...). The snapshot
  * commit protocol is a CAS on the version file — local FS and HDFS
  * give us that natively, object stores do not, so two writers could
  * both "win" the same version and silently drop a commit. A
  * registered provider (see [[SnapshotTable.setLockProvider]]) wraps
  * the check-and-publish step in an exclusive critical section,
  * restoring the CAS — the same role Delta's LogStore + DynamoDB lock
  * plays for delta-on-S3.
  *
  * Implementations must provide MUTUAL EXCLUSION per table path across
  * all concurrent writers (threads or processes). What backs it is
  * deployment-specific: a lock table in an external store, a lease
  * service, or — where create-if-absent IS atomic —
  * [[FileCommitLockProvider]].
  */
trait CommitLockProvider {
  /** Run `body` while holding the exclusive commit lock for
    * `tablePath`; the lock must be released on all exit paths. */
  def withLock[T](tablePath: String)(body: => T): T
}

/** Reference lock provider: an exclusive `.commit.lock` file created
  * atomically inside the table's log directory, with a lease-based
  * expiry so a crashed holder cannot wedge the table forever (a lock
  * file older than `leaseMs` is broken and re-acquired).
  *
  * Scope: correct where file creation is atomic — local FS
  * (java.nio `createFile`) and HDFS (`create(overwrite = false)`).
  * It is the working default for multi-writer tests and NFS/HDFS
  * deployments, and the template for an object-store provider (swap
  * the create-if-absent for a conditional PUT or an external lock
  * table — plain S3 file creation is NOT atomic, which is the whole
  * reason this interface exists).
  */
class FileCommitLockProvider(leaseMs: Long = 60000L,
    acquireTimeoutMs: Long = 60000L) extends CommitLockProvider {

  override def withLock[T](tablePath: String)(body: => T): T = {
    val spark = SparkSession.active
    val fs = SnapshotTable.fs(spark, tablePath)
    val lock = new Path(s"${SnapshotTable.logDir(tablePath)}/.commit.lock")
    fs.mkdirs(lock.getParent)
    val deadline = System.currentTimeMillis() + acquireTimeoutMs
    var acquired = false
    while (!acquired) {
      acquired =
        try {
          if (Option(fs.getScheme).contains("file")) {
            java.nio.file.Files.createFile(
              java.nio.file.Paths.get(lock.toUri.getPath))
            true
          } else {
            val out = fs.create(lock, false)
            out.close()
            true
          }
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException => false
        }
      if (!acquired) {
        // break a stale lease (holder crashed mid-commit); the
        // subsequent create-if-absent stays the atomic arbiter if two
        // breakers race
        val stale =
          try fs.getFileStatus(lock).getModificationTime <
            System.currentTimeMillis() - leaseMs
          catch { case _: java.io.FileNotFoundException => false }
        if (stale) fs.delete(lock, false)
        else if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"could not acquire commit lock $lock within ${acquireTimeoutMs}ms " +
              s"(held and not stale; lease ${leaseMs}ms)")
        else Thread.sleep(20L + scala.util.Random.nextInt(30))
      }
    }
    try body
    finally fs.delete(lock, false)
  }
}
