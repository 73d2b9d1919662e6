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
