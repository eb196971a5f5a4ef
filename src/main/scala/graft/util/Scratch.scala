package graft.util

import java.nio.file.{Files, Path}

/** Per-JVM scratch space for operators that stage intermediate files
  * (partitioned rewrites, format round-trips, binary fixtures).
  *
  * A FIXED path under `java.io.tmpdir` is a race: overwrite-mode writes
  * delete-and-rewrite the directory, so two concurrent JVMs (bench +
  * sbt test, or two users on a shared host) sharing the name would pull
  * files out from under each other mid-scan — and stale subdirs from
  * older layouts would silently pollute a mergeSchema read. A per-JVM
  * random root isolates processes while keeping paths stable WITHIN a
  * process, so fixture writers stay idempotent and per-run caches still
  * hit. On a cluster the analog is a job-scoped staging prefix on
  * shared storage.
  */
object Scratch {
  private lazy val root: Path = {
    gcStaleRoots()
    val p = Files.createTempDirectory("graft_scratch_")
    p.toFile.deleteOnExit()
    p
  }

  /** Bound /tmp growth across runs: the populated root intentionally
    * survives JVM exit (a later out-of-process oracle pass may still
    * read its files — deleteOnExit only removes an empty dir), so each
    * NEW process best-effort deletes sibling roots older than 6 hours.
    * Recent roots stay; concurrent JVMs' live roots are far younger
    * than the cutoff. */
  private def gcStaleRoots(): Unit =
    try {
      val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
      val cutoff = System.currentTimeMillis() - 6L * 3600 * 1000
      Option(tmp.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("graft_scratch_")
          && f.lastModified() < cutoff)
        .foreach(deleteRecursively)
    } catch { case _: Exception => () } // GC is best-effort, never fatal

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete()
  }

  /** A named scratch directory under this JVM's private root (created
    * if absent; same name → same path within the process). Each call
    * touches the root's mtime: a directory's mtime only moves when
    * DIRECT children change, so a JVM alive past the 6-hour GC cutoff
    * (all its subdirs created early) would otherwise have its scratch
    * deleted out from under it by any newly started graft process. */
  def dir(name: String): String = {
    val d = root.resolve(name)
    Files.createDirectories(d)
    try Files.setLastModifiedTime(root,
      java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
    catch { case _: Exception => () } // heartbeat is best-effort
    d.toAbsolutePath.toString
  }
}
