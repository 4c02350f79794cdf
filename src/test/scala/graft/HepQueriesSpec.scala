package graft

import java.nio.file.Files

import graft.core.{Manifest, Storage}
import graft.fixtures.FixtureGen
import graft.query.DeclaredHep

/** H1–H4 through the real QueryService/Storage path over the deterministic
  * ingest-generated fixture (SURVEY §2.9; VERDICT r1 next-round item #1).
  * The DuckDB hash-compare runs in tools/oracle_check.py; these tests pin
  * engine-side invariants derivable from the generator's arithmetic. */
class HepQueriesSpec extends GraftSuite {

  test("fixture generates mixed raw/compacted multi-writer layout") {
    val base = FixtureGen.ensure(spark)
    val m1 = Manifest.loadTable(Manifest.tableManifestPath(base, "writer1", "hep_1")).get
    assert(m1.files.exists(_.`type` == "compacted"), "old buckets compacted")
    assert(m1.files.exists(_.`type` == "raw"), "recent buckets stay raw")
    assert(m1.row_count == 60)
    val m2 = Manifest.loadTable(Manifest.tableManifestPath(base, "writer2", "hep_1")).get
    assert(m2.files.nonEmpty && m2.files.forall(_.`type` == "raw"))
    assert(m2.row_count == 10)
    // Multi-writer union at query time.
    val df = new Storage(base).load(spark, "hep_1", Long.MinValue, Long.MaxValue).get
    assert(df.count() == 70)
  }

  test("h2 default range keeps exactly the last-10-min rows across writers") {
    // writer1: i in 45..59 inside [19:10,19:20] → 15 rows; writer2: 10 rows.
    val row = DeclaredHep.h2(spark, sf).collect()(0)
    assert(row.getLong(row.fieldIndex("cnt")) == 25)
    assert(row.getInt(row.fieldIndex("max_dp")) == 5060)
  }

  test("h1 virtual columns resolve and LIKE filters within the window") {
    val rows = DeclaredHep.h1(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      assert(r.getString(r.fieldIndex("payload")).contains("INVITE"))
      assert(r.getString(r.fieldIndex("src_ip")).startsWith("192.168.1."))
      assert(r.getString(r.fieldIndex("dst_ip")).startsWith("10.0.0."))
    }
    // Sorted by time.
    val times = rows.map(_.getTimestamp(0).getTime)
    assert(times.sameElements(times.sorted))
  }

  test("h3 filters LP doubles; h4 aggregates them") {
    val h3 = DeclaredHep.h3(spark, sf).collect()
    assert(h3.nonEmpty && h3.forall(_.getDouble(1) > 50))
    val h4 = DeclaredHep.h4(spark, sf).collect()(0)
    assert(h4.getLong(h4.fieldIndex("cnt")) == 15)
    val expectedAvg = (0 until 15).map(i => 40.0 + (i * 11 % 50)).sum / 15.0
    assert(h4.getLong(h4.fieldIndex("a_x100")) == math.round(expectedAvg * 100))
  }
}
