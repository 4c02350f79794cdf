package graft

import java.nio.file.{Files, Path}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Manifest, TimeUtils}

class ManifestSpec extends AnyFunSuite {

  def entry(id: Long, path: String, minNs: Long, maxNs: Long): Manifest.FileEntry =
    Manifest.FileEntry(id, path, 100, 10, TimeUtils.chunkTimeNs(minNs), minNs, maxNs)

  test("round-trip through JSON preserves the FIXTURES.md shape") {
    val tmp = Files.createTempDirectory("manifest")
    val m = Manifest.emptyTable(Left(1))
      .addFile(entry(0, "a.parquet", 1739043338978000000L, 1739043934193000000L))
    val p = tmp.resolve("metadata.json")
    Manifest.save(p, m)
    val back = Manifest.loadTable(p).get
    assert(back == m)
    val json = Files.readString(p)
    for (k <- Seq("parquet_size_bytes", "row_count", "min_time", "max_time",
        "wal_sequence", "files", "chunk_time"))
      assert(json.contains("\"" + k + "\""), s"missing $k")
    assert(back.typeName == "hep_1")
  }

  test("totals roll up from files (hepop.js:253–262)") {
    val m = Manifest.emptyTable(Right("cpu"))
      .addFile(entry(0, "a.parquet", 100, 200))
      .addFile(entry(1, "b.parquet", 50, 150))
    assert(m.row_count == 20)
    assert(m.min_time == 50 && m.max_time == 200)
    assert(m.wal_sequence == 2)
    assert(m.typeName == "cpu")
  }

  test("pruning: overlap semantics of query.js:47–51") {
    val tmp = Files.createTempDirectory("prune")
    def touch(name: String): String = { Files.writeString(tmp.resolve(name), "x"); name }
    val m = Manifest.emptyTable(Left(1))
      .addFile(entry(0, touch("f0"), 100, 200))
      .addFile(entry(1, touch("f1"), 300, 400))
      .addFile(entry(2, touch("f2"), 500, 600))

    def prune(s: Long, e: Long): Seq[String] =
      Manifest.pruneFiles(m, tmp, s, e).map(p => Path.of(p).getFileName.toString)

    assert(prune(150, 350) == Seq("f0", "f1"))    // overlap both ends
    assert(prune(200, 300) == Seq("f0", "f1"))    // boundary inclusive
    assert(prune(201, 299) == Seq())              // gap
    assert(prune(350, 350) == Seq("f1"))          // point '=' lookup
    assert(prune(Long.MinValue, 250) == Seq("f0")) // open start
    assert(prune(450, Long.MaxValue) == Seq("f2")) // open end
  }

  test("pruning drops files missing on disk (query.js:43 healing)") {
    val tmp = Files.createTempDirectory("heal")
    Files.writeString(tmp.resolve("present"), "x")
    val m = Manifest.emptyTable(Left(1))
      .addFile(entry(0, "missing", 100, 200))
      .addFile(entry(1, "present", 100, 200))
    assert(Manifest.pruneFiles(m, tmp, 0, 1000).map(p => Path.of(p).getFileName.toString)
      == Seq("present"))
  }

  test("pruning sorts by min_time (query.js:62)") {
    val tmp = Files.createTempDirectory("sort")
    Seq("late", "early").foreach(n => Files.writeString(tmp.resolve(n), "x"))
    val m = Manifest.emptyTable(Left(1))
      .addFile(entry(0, "late", 500, 600))
      .addFile(entry(1, "early", 100, 200))
    assert(Manifest.pruneFiles(m, tmp, 0, 1000).map(p => Path.of(p).getFileName.toString)
      == Seq("early", "late"))
  }

  test("compaction swap replaces inputs atomically") {
    val m = Manifest.emptyTable(Left(1))
      .addFile(entry(0, "a", 100, 200))
      .addFile(entry(1, "b", 300, 400))
    val c = entry(2, "c_2", 100, 400).copy(`type` = "compacted", range = Some("1h"))
    val after = m.replaceFiles(Set("a", "b"), c)
    assert(after.files.map(_.path) == List("c_2"))
    assert(after.min_time == 100 && after.max_time == 400)
  }

  test("TimeUtils directory naming matches reference layout (hepop.js:114–132)") {
    // 2025-02-08T19:35:38.978Z
    val ms = 1739043338978L
    assert(TimeUtils.dateDir(ms) == "2025-02-08")
    assert(TimeUtils.timeDir(ms) == "19-30")
    assert(TimeUtils.hourDir(ms) == "19-00")
    assert(TimeUtils.chunkTimeNs(TimeUtils.msToNs(ms)) % TimeUtils.NsPerTenMin == 0)
    assert(TimeUtils.isoMs(TimeUtils.msToNs(ms)) == "2025-02-08 19:35:38.978")
  }
}
