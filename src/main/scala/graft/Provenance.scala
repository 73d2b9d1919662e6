package graft

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

/** Build-keyed provenance hash for close-time gates.
  *
  * tools/counts.py's --at-close checks used to compare file MTIMES
  * (verify dump vs newest file under src/main; sbt log vs src/test) —
  * fragile both ways: a fresh git checkout resets every source mtime
  * to checkout time (a current dump falsely fails), and a missing
  * tree made newest_mtime return 0 (a stale dump silently passes) —
  * the round-17 advice item. The fix is CONTENT keying: the artifact
  * records a hash of the source tree it was built from, and counts.py
  * recomputes the same hash at check time. [[Verify]] writes
  * `provenance.json` (hash of src/main) next to the dump; the test
  * suite's ProvenanceSpec prints the src/main+src/test hash into the
  * sbt log. The algorithm here MUST stay in lock-step with
  * `tree_hash()` in tools/counts.py: sha256 over files sorted by
  * unix-style relative path, each contributing
  * `relpath \0 bytes \0`.
  */
object Provenance {

  /** sha256 over every regular file under `roots` (paths relative to
    * `base`, '/'-separated, sorted), hex lowercase. */
  def treeHash(base: Path, roots: Seq[String]): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val files = roots.flatMap { r =>
      val root = base.resolve(r)
      if (!Files.isDirectory(root)) Nil
      else {
        val st = Files.walk(root)
        try st.iterator().asScala.filter(Files.isRegularFile(_)).toList
        finally st.close()
      }
    }
    files
      .map(p => (base.relativize(p).toString.replace('\\', '/'), p))
      .sortBy(_._1)
      .foreach { case (rel, p) =>
        md.update(rel.getBytes("UTF-8")); md.update(0.toByte)
        md.update(Files.readAllBytes(p)); md.update(0.toByte)
      }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** The repo root — Verify and the suite both run via sbt with the
    * repo as working directory. */
  def repoRoot: Path = Paths.get(".").toAbsolutePath.normalize
}
