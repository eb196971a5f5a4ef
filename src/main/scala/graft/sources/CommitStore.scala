package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The ONE primitive the versioned-table commit protocol needs from
  * storage: atomically publish a manifest's full content at a path,
  * failing if the path already exists — put-if-absent IS the commit
  * (the same seam Delta calls a LogStore). Two guarantees, both load-
  * bearing for the four-writer OCC race:
  *
  *   1. MUTUAL EXCLUSION — of N concurrent put-if-absent calls on one
  *      destination, exactly one succeeds; every loser throws.
  *   2. COMPLETE-OR-ABSENT — a concurrent reader never observes a
  *      partially written destination.
  *
  * Implementations exist where the filesystem has an atomic primitive:
  * local (temp + hard-link, O_EXCL-atomic) and HDFS-class stores
  * (temp + namenode-atomic rename). S3-class object stores have
  * NEITHER primitive natively — a deployment there must [[CommitStore.register]]
  * an implementation built on the store's conditional-put (S3
  * If-None-Match, GCS if-generation-match) or an external coordinator
  * (the DynamoDB pattern); an UNREGISTERED scheme fails loudly at
  * commit time rather than silently racing to lost writes. */
trait CommitStore {

  /** Publish `bytes` at `dst` iff `dst` does not exist; throw
    * `java.io.IOException` (or `FileAlreadyExistsException`) if it
    * does — or on any failure that leaves the commit unpublished.
    * `logDir` is the manifest directory, usable for temp staging. */
  def putIfAbsent(fs: FileSystem, logDir: HPath, dst: HPath,
      bytes: Array[Byte]): Unit
}

object CommitStore {

  /** Local filesystems: write the full content to a temp file, then
    * hard-LINK it onto the destination. link(2) is O_EXCL-atomic AND
    * the destination appears with its complete content. (Hadoop's
    * local create(overwrite=false) is check-then-act — two racing
    * writers can BOTH pass the exists check and one manifest silently
    * overwrites the other; observed as a 1-in-N flake in the
    * thread-parallel OCC spec before the link protocol.) */
  object LocalLink extends CommitStore {
    override def putIfAbsent(fs: FileSystem, logDir: HPath, dst: HPath,
        bytes: Array[Byte]): Unit = {
      val dstP = java.nio.file.Paths.get(dst.toUri.getPath)
      val tmp = dstP.resolveSibling(
        s".tmp_${dst.getName.stripSuffix(".json")}_" +
          java.util.UUID.randomUUID().toString.take(8))
      java.nio.file.Files.write(tmp, bytes)
      try java.nio.file.Files.createLink(dstP, tmp) // throws if dst exists
      finally java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** HDFS-class filesystems: write the FULL content to a temp log
    * path, then rename onto the destination. A bare
    * create(false)-then-write could fail AFTER the create succeeded,
    * publishing a visible PARTIAL manifest — every later reader's
    * snapshot() would fail until someone hand-deleted it. With
    * write-then-rename, a write failure leaves only a temp file
    * (cleaned here, swept by vacuum if we crash), and the manifest
    * appears atomically complete or not at all: HDFS rename is
    * namenode-atomic and refuses an existing destination. */
  object HdfsRename extends CommitStore {
    override def putIfAbsent(fs: FileSystem, logDir: HPath, dst: HPath,
        bytes: Array[Byte]): Unit = {
      val tmp = new HPath(logDir,
        s".tmp_${dst.getName.stripSuffix(".json")}_" +
          java.util.UUID.randomUUID().toString.take(8))
      try {
        val out = fs.create(tmp, false)
        try out.write(bytes) finally out.close()
      } catch { case e: Throwable =>
        try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
        throw e
      }
      // a failed rename is only a LOST RACE when the destination
      // actually exists — mapping every IOException to "lost the race"
      // would send a transient namenode/FS outage down the OCC-rebase
      // diagnostic path (and retry loops would rebase when they should
      // surface the outage)
      val renamed: Either[java.io.IOException, Boolean] =
        try Right(fs.rename(tmp, dst))
        catch { case e: java.io.IOException => Left(e) }
      if (renamed != Right(true)) {
        try fs.delete(tmp, false) catch { case _: java.io.IOException => () }
        if (fs.exists(dst))
          throw new java.io.IOException(
            s"manifest $dst already exists (lost the commit race)")
        renamed match {
          case Left(e) => throw e // genuine FS failure, unpublished
          case _ => throw new java.io.IOException(
            s"rename to $dst refused but no manifest exists there — " +
              "filesystem failure, commit not published")
        }
      }
    }
  }

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitStore]()
  registry.put("file", LocalLink)
  registry.put("hdfs", HdfsRename)
  registry.put("viewfs", HdfsRename)

  /** Register (or replace) the commit store for a filesystem scheme —
    * the deployment hook for object stores with a conditional-put. */
  def register(scheme: String, store: CommitStore): Unit =
    registry.put(scheme.toLowerCase(java.util.Locale.ROOT), store)

  /** Known object-store schemes called out BY NAME in the refusal, so
    * the error reads as "S3 needs a conditional-put store", not as a
    * generic unknown-scheme complaint. */
  private val ObjectStoreSchemes = Set(
    "s3", "s3a", "s3n", "gs", "abfs", "abfss", "wasb", "wasbs", "oss",
    "cos", "cosn", "swift")

  /** The commit store for `scheme`, or a LOUD refusal: a commit
    * protocol silently falling back to rename on a store where rename
    * is copy-then-delete (S3A) loses manifests under concurrency —
    * the failure surfaces as corrupted history long after the race. */
  def forScheme(scheme: String): CommitStore = {
    val s = scheme.toLowerCase(java.util.Locale.ROOT)
    val found = registry.get(s)
    if (found != null) found
    else if (ObjectStoreSchemes(s)) throw new IllegalArgumentException(
      s"no atomic commit primitive for '$s://' — object stores have " +
        "neither O_EXCL link nor atomic no-overwrite rename, so the " +
        "put-if-absent commit cannot be guaranteed natively. Register " +
        "a CommitStore built on the store's conditional put (S3 " +
        "If-None-Match / GCS if-generation-match) or an external " +
        "coordinator via CommitStore.register(scheme, store).")
    else throw new IllegalArgumentException(
      s"no CommitStore registered for filesystem scheme '$s' — the " +
        "versioned-table commit needs an atomic put-if-absent; register " +
        "one via CommitStore.register(scheme, store) (HDFS-class " +
        "filesystems with atomic no-overwrite rename can reuse " +
        "CommitStore.HdfsRename).")
  }
}
