package graft

import java.io.{File, FileInputStream}
import java.security.MessageDigest

/** Content-keyed, atomically-published store for trained artifacts
  * (IVF indexes, BPE vocabularies) under java.io.tmpdir — the
  * train-once / apply-many lifecycle shared by graft.queries.Ivf and
  * graft.queries.Bpe.
  *
  * Key discipline: [[contentKey]] hashes the SOURCE TABLE's full file
  * bytes plus a trainer-version tag, so (a) a same-size rewrite of the
  * corpus within mtime granularity can never serve a stale artifact
  * (the round-7 advice item against the mtime-keyed cache), and (b) a
  * trainer change invalidates every cached artifact by construction.
  * Hashing the bytes is proportional to the source table — fine for
  * the local cache this is (MBs); a 100 TB deployment keys on the
  * catalog's snapshot/commit id instead, which is this same idea with
  * the content hash maintained by the table format.
  *
  * Publish discipline: [[ensure]] builds into a private temp directory
  * and renames it into place, so concurrent builders race benignly
  * (one rename wins, the loser discards its temp dir) and a crashed
  * build never leaves a half-written artifact at the published path —
  * completeness is "the top-level _SUCCESS marker exists inside the
  * atomically-renamed directory", never "the writer happened to
  * finish". */
object ArtifactStore {

  /** MD5 over (relative path, length, full content) of every file under
    * `tableDir` in sorted order, plus the trainer `version` tag. */
  def contentKey(tableDir: String, version: String): String = {
    val root = new File(tableDir)
    val md = MessageDigest.getInstance("MD5")
    md.update(version.getBytes("UTF-8"))
    def files(f: File): Seq[File] =
      if (f.isDirectory)
        // listFiles() is null on permission errors / concurrent deletes:
        // treat as empty rather than NPE (round-7 advice item)
        Option(f.listFiles()).getOrElse(Array.empty[File])
          .sortBy(_.getName).toSeq.flatMap(files)
      else Seq(f)
    val buf = new Array[Byte](1 << 16)
    files(root).foreach { f =>
      md.update(s"${f.getName}:${f.length()}:".getBytes("UTF-8"))
      val in = new FileInputStream(f)
      try {
        var n = in.read(buf)
        while (n >= 0) { if (n > 0) md.update(buf, 0, n); n = in.read(buf) }
      } finally in.close()
    }
    md.digest().map("%02x".format(_)).mkString
  }

  /** Published location for artifact `kind` under content key `key`. */
  def cachePath(kind: String, key: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_artifacts/$kind/$key"

  /** Return `path` if a complete artifact is already published there;
    * otherwise run `build` against a temp sibling directory and
    * atomically rename it into place. Safe under concurrent callers:
    * exactly one build is published, the rest are discarded. */
  def ensure(path: String)(build: String => Unit): String = {
    val root = new File(path)
    if (new File(root, "_SUCCESS").exists()) return path
    root.getParentFile.mkdirs()
    val tmp = new File(root.getParentFile,
      s".${root.getName}.tmp-${java.util.UUID.randomUUID()}")
    try {
      build(tmp.toString)
      if (!new File(tmp, "_SUCCESS").createNewFile())
        throw new java.io.IOException(s"cannot mark $tmp complete")
      if (!tmp.renameTo(root) && !new File(root, "_SUCCESS").exists())
        throw new java.io.IOException(
          s"cannot publish artifact at $root (rename failed, no winner)")
    } finally deleteRecursively(tmp) // no-op if the rename won
    path
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty[File])
        .foreach(deleteRecursively)
    f.delete()
  }
}
