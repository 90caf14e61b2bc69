package graft.etl

/** Exclusive writer lease over a storage directory: atomically create a
  * `_lock` file (create-with-overwrite=false — atomic on HDFS and the
  * local FS), run `body`, delete the lock. A second writer arriving while
  * the lock is held FAILS LOUDLY with the holder's identity instead of
  * proceeding. Extracted from the signature store
  * ([[graft.operators.Dedup.incrementalMinhashPairs]]) so every
  * mutate-in-place artifact (signature store, stored ANN index) shares
  * one lease discipline.
  *
  * Serialization, not just detection: the lease brackets the holder's
  * WHOLE snapshot→compute→publish window, so a later writer's snapshot
  * always includes every published batch (see the signature-store doc for
  * the lost-cross-pairs failure this prevents).
  *
  * No auto-expiry: a crashed holder leaves the lock behind and later
  * writers fail with its identity + acquisition time until an operator
  * removes the file — a timeout that silently broke a slow-but-live
  * writer's lock would reintroduce exactly the silent-loss scenario the
  * lock exists to prevent. */
object WriterLease {

  /** Lease file name. Leading '_' keeps it out of store listings and
    * Spark's parquet file index. */
  val LockFile = "_lock"

  /** `what` names the artifact in the conflict message (e.g. "signature
    * store", "ivf-pq index"). */
  def withLock[T](fs: org.apache.hadoop.fs.FileSystem,
      dir: org.apache.hadoop.fs.Path, what: String = "store")(body: => T): T = {
    fs.mkdirs(dir)
    val lock = new org.apache.hadoop.fs.Path(dir, LockFile)
    val owner =
      s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}/" +
        s"${java.util.UUID.randomUUID()}@${System.currentTimeMillis()}"
    val acquired =
      try {
        val out = fs.create(lock, false) // atomic create-if-absent
        out.write(owner.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        out.close()
        true
      } catch {
        // Some FileSystems throw the typed exception, others a plain
        // IOException("File already exists") — distinguish contention
        // from a genuine IO failure by whether the lock is there now. A
        // real IO error must PROPAGATE (same policy as store reads).
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.io.IOException if fs.exists(lock) => false
      }
    if (!acquired) {
      val holder =
        try {
          val in = fs.open(lock)
          try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
          finally in.close()
        } catch { case _: java.io.IOException => "<unreadable>" }
      throw new IllegalStateException(
        s"$what at $dir is locked by a concurrent writer " +
          s"($holder); if that writer is dead, delete ${lock.getName} and retry")
    }
    try body
    finally fs.delete(lock, false)
  }
}
