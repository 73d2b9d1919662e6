package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The artifact cache's two contracts: (1) the key follows CONTENT —
  * in particular a same-size in-place rewrite (the round-7 advice
  * case that mtime+size keys miss) changes the key; (2) publication
  * is atomic and idempotent — a complete artifact is never rebuilt,
  * a losing concurrent builder is discarded cleanly. */
class ArtifactStoreSpec extends AnyFunSuite {

  private def writeTable(dir: java.io.File, content: String): Unit = {
    dir.mkdirs()
    Files.writeString(new java.io.File(dir, "part-0.parquet").toPath, content)
  }

  test("contentKey: same-size rewrite and version bump both change the key") {
    val d = Files.createTempDirectory("as_key").toFile
    val t = new java.io.File(d, "tbl.parquet")
    writeTable(t, "aaaaaaaa")
    val k1 = ArtifactStore.contentKey(t.toString, "v1")
    assert(k1 === ArtifactStore.contentKey(t.toString, "v1"), "key not stable")
    assert(k1 !== ArtifactStore.contentKey(t.toString, "v2"),
      "trainer version not folded into the key")
    writeTable(t, "bbbbbbbb") // same length, same mtime granularity
    assert(k1 !== ArtifactStore.contentKey(t.toString, "v1"),
      "same-size rewrite served a stale key")
  }

  test("contentKey memo: a changed file (new mtime/len) re-keys, unchanged is cached") {
    val d = Files.createTempDirectory("as_memo").toFile
    val t = new java.io.File(d, "tbl.parquet")
    writeTable(t, "cccccccc")
    val k1 = ArtifactStore.contentKey(t.toString, "v1")
    // same (path, len, mtime, version) serves from the memo — observable
    // only as stability here; the real guarantee is the next assert
    assert(k1 === ArtifactStore.contentKey(t.toString, "v1"))
    writeTable(t, "ccccccccdd") // longer: memo key differs, bytes re-hashed
    val k2 = ArtifactStore.contentKey(t.toString, "v1")
    assert(k1 !== k2, "length change did not invalidate the memo")
    val f = new java.io.File(t, "part-0.parquet")
    Files.writeString(f.toPath, "ccccccccdd")
    f.setLastModified(System.currentTimeMillis() + 5000) // same len, new mtime
    assert(ArtifactStore.contentKey(t.toString, "v1") === k2,
      "same content must key identically even after an mtime-only touch")
  }

  test("ensure: sweeps abandoned temp dirs from crashed builds") {
    val parent = Files.createTempDirectory("as_gc").toFile
    val root = new java.io.File(parent, "artifact")
    val stale = new java.io.File(parent, ".artifact.tmp-dead-uuid")
    stale.mkdirs()
    Files.writeString(new java.io.File(stale, "partial").toPath, "junk")
    stale.setLastModified(System.currentTimeMillis() - 2L * 60 * 60 * 1000)
    val fresh = new java.io.File(parent, ".artifact.tmp-live-uuid")
    fresh.mkdirs() // a concurrent in-flight build: must survive
    ArtifactStore.ensure(root.toString) { tmp =>
      new java.io.File(tmp).mkdirs()
    }
    assert(!stale.exists(), "crashed build's temp dir not swept")
    assert(fresh.exists(), "in-flight sibling build was swept")
  }

  test("ensure: builds once, atomic marker, concurrent losers discarded") {
    val root = Files.createTempDirectory("as_pub").toString + "/artifact"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    def build(tmp: String): Unit = {
      builds.incrementAndGet()
      new java.io.File(tmp).mkdirs()
      Files.writeString(new java.io.File(tmp, "data").toPath, "x")
    }
    // two concurrent first-touch builders: both may build, exactly one
    // publishes, and the published artifact is complete
    val threads = (1 to 2).map(_ => new Thread(() =>
      ArtifactStore.ensure(root)(build)))
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(new java.io.File(root, "_SUCCESS").exists(), "no marker published")
    assert(Files.readString(new java.io.File(root, "data").toPath) === "x")
    // no temp siblings left behind
    val leftovers = new java.io.File(root).getParentFile.listFiles()
      .filter(_.getName.contains(".tmp-"))
    assert(leftovers.isEmpty, s"temp dirs not cleaned: ${leftovers.toSeq}")
    // a complete artifact is never rebuilt
    val before = builds.get()
    ArtifactStore.ensure(root)(build)
    assert(builds.get() === before, "published artifact was rebuilt")
  }
}
