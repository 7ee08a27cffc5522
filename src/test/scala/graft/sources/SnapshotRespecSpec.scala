package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** Partition-spec evolution ([[SnapshotStore.respec]]) — the contract
  * that lets a live store follow the partitions-∝-corpus sizing rule:
  *
  *  (a) a full re-spec changes ONLY the routing column's values (key
  *      semantics untouched), moves every file under the new layout in
  *      one commit, and pre-respec versions time-travel byte-exact
  *      (old values, old files) until vacuum;
  *  (b) PARTITION-AT-A-TIME: an incremental migration leaves the store
  *      fully readable mid-way (mixed specs are just files), and
  *      maintenance — a retract routed off stored VALUES — lands
  *      correctly BETWEEN two respec slices;
  *  (c) a re-spec that would retype the routing column is refused;
  *      choosing no existing dirs is a commitless no-op.
  */
class SnapshotRespecSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def freshRoot(): String =
    Files.createTempDirectory("snaprespec").resolve("store").toString

  private def baseRows = {
    val rows =
      Seq(("g000", 99L), ("g000", 500L), ("g008", 99L), ("g008", 501L),
        ("g001", 99L), ("g001", 502L), ("g009", 503L),
        ("g002", 99L), ("g010", 99L)) ++
        (3 to 7).flatMap(k =>
          Seq((f"g$k%03d", 600L + k), (f"g${k + 8}%03d", 700L + k)))
    rows.toDF("g", "doc_id")
      .withColumn("pt", (substring($"g", 2, 3).cast("int") % 8))
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame) =
    df.select($"g", $"doc_id").as[(String, Long)].collect().toSet

  private val wide = pmod(xxhash64(col("g")), lit(64)).cast("int")

  test("(a) a full re-spec re-routes every row in one commit; key " +
      "semantics and time travel are untouched") {
    val root = freshRoot()
    val v1 = SnapshotStore.init(spark, root, baseRows, "pt")
    val v1Rows = SnapshotStore.read(spark, root)
      .as[(String, Long, Int)].collect().toSet

    val (moved, v2) = SnapshotStore.respec(spark, root, wide)
    assert(moved === v1.files.map(_.takeWhile(_ != '/')).distinct.size)
    assert(v2.op === SnapshotStore.OpRespec)
    assert(v2.files.toSet.intersect(v1.files.toSet).isEmpty,
      "a re-routed partition kept old-spec files in the manifest")
    // keys unchanged; every row routed by the NEW derivation
    val after = SnapshotStore.read(spark, root)
    assert(rowSet(after) === rowSet(baseRows))
    assert(after.filter($"pt" =!=
      pmod(xxhash64($"g"), lit(64)).cast("int")).count() === 0L,
      "a row escaped the new routing derivation")
    // pre-respec time travel is byte-exact: same files, OLD values
    val tt = SnapshotStore.readAt(spark, root, 1L)
    assert(SnapshotStore.snapshotAt(spark, root, 1L).files === v1.files)
    assert(tt.as[(String, Long, Int)].collect().toSet === v1Rows)
  }

  test("(b) partition-at-a-time: readable mid-way, maintenance lands " +
      "between slices, the migration converges") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")
    val dirs = SnapshotStore.current(spark, root).files
      .map(_.takeWhile(_ != '/')).distinct.sorted
    val (firstHalf, secondHalf) = dirs.splitAt(dirs.size / 2)

    val (m1, _) = SnapshotStore.respec(spark, root, wide, firstHalf)
    assert(m1 === firstHalf.size)
    // MID-WAY: both specs readable; keys intact
    assert(rowSet(SnapshotStore.read(spark, root)) === rowSet(baseRows))
    // maintenance between slices: retract routes off stored VALUES,
    // which now span both specs
    val (rewritten, removed, _) = SnapshotStore.retract(spark, root,
      SnapshotStore.read(spark, root).filter($"doc_id" === 99L),
      Seq("g", "doc_id"), "pt")
    assert(removed === 5L, s"mid-respec retract removed $removed")
    assert(rewritten >= 1)
    val want = rowSet(baseRows.filter($"doc_id" =!= 99L))
    assert(rowSet(SnapshotStore.read(spark, root)) === want)

    // converge: re-spec everything still under the old derivation
    SnapshotStore.respec(spark, root, wide)
    val after = SnapshotStore.read(spark, root)
    assert(rowSet(after) === want)
    assert(after.filter($"pt" =!=
      pmod(xxhash64($"g"), lit(64)).cast("int")).count() === 0L,
      "the incremental migration failed to converge")
  }

  test("(c) retyping the routing column is refused; an empty dir " +
      "selection is a commitless no-op") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")
    val before = SnapshotStore.current(spark, root).version
    intercept[IllegalArgumentException] {
      SnapshotStore.respec(spark, root, lit("not-an-int"))
    }
    assert(SnapshotStore.current(spark, root).version === before)
    val (moved, snap) = SnapshotStore.respec(spark, root, wide,
      Seq("pt=no-such-dir"))
    assert(moved === 0 && snap.version === before)
  }
}
