package graft

/** Shared filesystem assertions for partition-granular write tests. */
object TestFiles {

  /** md5 per data file under the partition dirs of `root`, keyed by path
    * relative to root. Bookkeeping files (_SUCCESS) excluded — these
    * assertions are about partition DATA bytes. */
  def partFileHashes(root: String): Map[String, String] = {
    val base = new java.io.File(root)
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(base)
      .filter(f => f.getName.startsWith("part-"))
      .map { f =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(java.nio.file.Files.readAllBytes(f.toPath))
        base.toPath.relativize(f.toPath).toString -> digest.map("%02x".format(_)).mkString
      }.toMap
  }

  /** Number of parquet data files under `root` (recursive, part- files
    * only) — the small-file-accretion metric compaction tests assert on. */
  def parquetFileCount(root: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk) else Seq(f)
    walk(new java.io.File(root)).count(_.getName.startsWith("part-"))
  }
}
