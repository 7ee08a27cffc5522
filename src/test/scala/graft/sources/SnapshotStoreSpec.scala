package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.SnapshotStore.ConcurrentCommitException

/** The atomic-snapshot store's contract — the claims are about what a
  * READER can ever observe, which is what the table-backed fold could
  * not guarantee:
  *
  *  (a) correctness: init/compact/retract produce exactly the set
  *      algebra the table-backed ops produce (the lifecycle query's
  *      hash-match seals this against the DuckDB oracle);
  *  (b) ISOLATION: a reader that resolved a snapshot before a
  *      maintenance cycle reads exactly that version's rows after the
  *      cycle committed — pre-state or post-state, never a mix — and
  *      every intermediate version stays readable until vacuum;
  *  (c) untouched partitions carry the IDENTICAL files across a
  *      retraction (relative-path set equality — files are immutable,
  *      so identical paths prove identical bytes);
  *  (d) an all-victims partition's files leave the manifest in the
  *      same one commit that publishes the survivors — there is no
  *      directory-delete step to half-apply;
  *  (e) CONCURRENCY: a writer committing from a stale base is refused
  *      (optimistic version check) — the single-writer contract the
  *      live ingest loop assumed, enforced by the store;
  *  (f) a mistyped caller routing column (LONG vs the store's INT)
  *      coerces through the semi-join instead of silently missing
  *      every partition;
  *  (g) vacuum reclaims exactly the unreferenced files and retired
  *      manifests, leaving the retained versions bit-identical.
  */
class SnapshotStoreSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def freshRoot(): String =
    Files.createTempDirectory("snapstore").resolve("store").toString

  /** (g, doc_id, pt) fixture — the IndexRetractSpec shape: victim 99
    * spans pt 0/1/2; pt 2 is victim-only (all-dead); pt 3..7 untouched. */
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

  test("init/compact/retract round-trip: keep-first admits, " +
      "partition-pruned retraction, all-dead partition files dropped " +
      "in the same commit") {
    val root = freshRoot()
    val v1 = SnapshotStore.init(spark, root, baseRows, "pt")
    assert(v1.version === 1L)
    assert(rowSet(SnapshotStore.read(spark, root)) === rowSet(baseRows))

    // keep-first: re-admitting every base row + two new rows appends
    // exactly the two
    val admits = baseRows.unionByName(
      Seq(("g003", 900L), ("g011", 901L)).toDF("g", "doc_id")
        .withColumn("pt", (substring($"g", 2, 3).cast("int") % 8)))
    val (n, v2) = SnapshotStore.compact(spark, root, admits,
      Seq("g", "doc_id"), "pt")
    assert(n === 2L)
    assert(v2.version === 2L)
    assert(v2.files.toSet.intersect(v1.files.toSet) === v1.files.toSet,
      "compact must carry every prior file forward untouched")

    val dead = baseRows.filter($"doc_id" === 99L)
    val (rewritten, removed, v3) = SnapshotStore.retract(spark, root,
      dead, Seq("g", "doc_id"), "pt")
    assert(rewritten === 3 && removed === 5L)
    val expect = rowSet(admits.filter($"doc_id" =!= 99L))
    assert(rowSet(SnapshotStore.read(spark, root)) === expect)

    // (c) untouched partitions: identical relative paths across retract
    def dirOf(f: String) = f.takeWhile(_ != '/')
    val affectedDirs = Set("pt=0", "pt=1", "pt=2")
    assert(v3.files.filterNot(f => affectedDirs(dirOf(f))).toSet
      === v2.files.filterNot(f => affectedDirs(dirOf(f))).toSet,
      "unaffected partitions' files changed across the retraction")
    // (d) all-victims pt=2 gone from the manifest in the same commit
    assert(!v3.files.exists(_.startsWith("pt=2/")),
      "all-victims partition still referenced after the retraction")
    assert(SnapshotStore.read(spark, root).filter($"pt" === 2).count() === 0)
  }

  test("reader isolation: a snapshot resolved before the maintenance " +
      "cycle reads exactly its version after the cycle — every version " +
      "exact, never a mix") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")
    // the in-flight reader resolves v1 NOW...
    val readerView = SnapshotStore.current(spark, root)

    // ...while maintenance runs a full compact+retract cycle
    val admits = Seq(("g003", 900L)).toDF("g", "doc_id")
      .withColumn("pt", lit(3))
    SnapshotStore.compact(spark, root, admits, Seq("g", "doc_id"), "pt")
    SnapshotStore.retract(spark, root,
      baseRows.filter($"doc_id" === 99L), Seq("g", "doc_id"), "pt")

    // the reader's view is still EXACTLY pre-cycle
    assert(rowSet(SnapshotStore.read(spark, root, readerView))
      === rowSet(baseRows),
      "in-flight reader observed a maintenance cycle")
    // and each committed version reads as exactly itself
    assert(rowSet(SnapshotStore.read(spark, root,
      SnapshotStore.snapshotAt(spark, root, 2L)))
      === rowSet(baseRows) + (("g003", 900L)))
    assert(rowSet(SnapshotStore.read(spark, root))
      === (rowSet(baseRows) + (("g003", 900L)))
        .filterNot(_._2 == 99L))
  }

  test("optimistic concurrency: a commit from a stale base is refused") {
    val root = freshRoot()
    val v1 = SnapshotStore.init(spark, root, baseRows, "pt")
    // writer B lands version 2 first
    SnapshotStore.compact(spark, root,
      Seq(("g003", 900L)).toDF("g", "doc_id").withColumn("pt", lit(3)),
      Seq("g", "doc_id"), "pt")
    // writer A, still holding base v1, tries to publish ITS version 2
    val ex = intercept[ConcurrentCommitException] {
      SnapshotStore.commit(spark, root, v1.files, v1.version)
    }
    assert(ex.getMessage.contains("concurrent"))
    // the store is untouched by the refused commit
    assert(SnapshotStore.current(spark, root).version === 2L)
  }

  test("mistyped routing column coerces through the semi-join instead " +
      "of missing every partition") {
    val root = freshRoot()
    SnapshotStore.init(spark, root,
      Seq(("g-a", 99L, 0), ("g-a", 500L, 0), ("g-b", 501L, 0))
        .toDF("g", "doc_id", "pt"), "pt")
    val (rewritten, removed, _) = SnapshotStore.retract(spark, root,
      Seq(("g-a", 99L)).toDF("g", "doc_id").withColumn("pt", lit(0L)),
      Seq("g", "doc_id"), "pt") // LONG routing value vs the store's INT
    assert(rewritten === 1 && removed === 1L)
    assert(rowSet(SnapshotStore.read(spark, root))
      === Set(("g-a", 500L), ("g-b", 501L)))
  }

  test("merge-on-read: staged deletes are atomically visible to readMor, " +
      "invisible to the physical view, and fold to the identical store") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")
    val dead = baseRows.filter($"doc_id" === 99L).select($"g", $"doc_id")
    val want = rowSet(baseRows.filter($"doc_id" =!= 99L))

    val staged = SnapshotStore.stageDeletes(spark, root, dead,
      Seq("g", "doc_id"))
    assert(staged.version === 2L, "staging must be one atomic commit")
    // deletion-aware readers see the deletes immediately...
    assert(rowSet(SnapshotStore.readMor(spark, root, Seq("g", "doc_id")))
      === want)
    // ...the physical view is untouched (zero data files rewritten)...
    assert(rowSet(SnapshotStore.read(spark, root)) === rowSet(baseRows))
    assert(staged.files.filterNot(_.startsWith("-")).toSet
      === SnapshotStore.snapshotAt(spark, root, 1L).files.toSet,
      "staging a delete-list touched data files")

    // ...and the fold makes the physical view equal the MOR view in ONE
    // commit, clearing the staged entries
    val (rewritten, removed, folded) = SnapshotStore.foldStagedDeletes(
      spark, root, Seq("g", "doc_id"), "pt")
    assert(rewritten === 3 && removed === 5L)
    assert(folded.version === 3L)
    assert(!folded.files.exists(_.startsWith("-")),
      "staged delete entries survived the fold")
    assert(rowSet(SnapshotStore.read(spark, root)) === want,
      "MOR != COW after the fold")
    // untouched partitions carry identical files across the whole cycle
    def dirOf(f: String) = f.takeWhile(_ != '/')
    val affectedDirs = Set("pt=0", "pt=1", "pt=2", "deletes")
    assert(folded.files.filterNot(f => affectedDirs(dirOf(f))).toSet
      === SnapshotStore.snapshotAt(spark, root, 1L).files
        .filterNot(f => affectedDirs(dirOf(f))).toSet)
    // vacuum retires the delete file with the old versions
    assert(SnapshotStore.vacuum(spark, root, keepVersions = 1) > 0)
    assert(rowSet(SnapshotStore.read(spark, root)) === want)
    // idempotence: folding with nothing staged is a no-op
    val (r2, n2, s2) = SnapshotStore.foldStagedDeletes(
      spark, root, Seq("g", "doc_id"), "pt")
    assert(r2 === 0 && n2 === 0L && s2.version === folded.version)
  }

  test("vacuum reclaims unreferenced files and retired manifests; " +
      "retained versions stay exact") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")
    SnapshotStore.retract(spark, root,
      baseRows.filter($"doc_id" === 99L), Seq("g", "doc_id"), "pt")
    val want = rowSet(baseRows.filter($"doc_id" =!= 99L))
    val deleted = SnapshotStore.vacuum(spark, root, keepVersions = 1)
    assert(deleted > 0, "vacuum found nothing despite a retraction")
    assert(rowSet(SnapshotStore.read(spark, root)) === want,
      "vacuum damaged the current version")
    intercept[Exception] {
      SnapshotStore.read(spark, root,
        SnapshotStore.snapshotAt(spark, root, 1L)).collect()
    }
  }
}
