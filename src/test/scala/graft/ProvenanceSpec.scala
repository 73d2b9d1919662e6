package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Build-keyed close-gate provenance (round-17 advice item): the sbt
  * test log self-certifies WHICH source tree it tested by printing
  * `PROVENANCE src_hash=<sha256 of src/main + src/test>`.
  * tools/counts.py --at-close greps that line and recomputes the same
  * hash — replacing the old mtime comparison, which a fresh git
  * checkout falsified in both directions (checkout resets source
  * mtimes; a missing tree made newest_mtime return 0 and pass
  * silently). */
class ProvenanceSpec extends AnyFunSuite {

  test("tree hash is stable, content-sensitive, and printed to the log") {
    val h1 = Provenance.treeHash(Provenance.repoRoot, Seq("src/main", "src/test"))
    val h2 = Provenance.treeHash(Provenance.repoRoot, Seq("src/main", "src/test"))
    assert(h1.matches("[0-9a-f]{64}"), s"not a sha256 hex: $h1")
    assert(h1 === h2, "hash not deterministic over an unchanged tree")
    // content sensitivity on a scratch tree (never mutate the real one)
    val d = Files.createTempDirectory("prov")
    Files.createDirectories(d.resolve("a"))
    Files.writeString(d.resolve("a/x.txt"), "one")
    val t1 = Provenance.treeHash(d, Seq("a"))
    Files.writeString(d.resolve("a/x.txt"), "two") // same length
    val t2 = Provenance.treeHash(d, Seq("a"))
    assert(t1 !== t2, "same-size content rewrite did not change the hash")
    // a missing root contributes nothing rather than crashing — the
    // python twin must agree (counts.py fails loudly on empty instead)
    assert(Provenance.treeHash(d, Seq("nope")) ===
           java.security.MessageDigest.getInstance("SHA-256").digest()
             .map(b => f"$b%02x").mkString)
    // the greppable line counts.py --at-close keys the sbt log to
    println(s"PROVENANCE src_hash=$h1")
  }
}
