package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** The change feed's contract — the two claims that make it usable at
  * 100 TB, pinned on the SnapshotStoreSpec fixture:
  *
  *  (a) CORRECTNESS: added/removed equal the key-set algebra between
  *      the two versions, a retract's survivor rewrite (old rows in
  *      brand-new files) contributes NOTHING (the anti-join is on
  *      keys, not files), and a staged-delete commit — which changes
  *      visible rows without touching data files — falls back to the
  *      full diff and reports its removals;
  *  (b) PRUNING: only partitions whose manifest file sets differ enter
  *      the plan at all (inputFiles ⊆ changed directories), because
  *      immutable files make name-set equality a PROOF of content
  *      equality — the manifest-driven pruning that keeps the feed's
  *      cost ∝ changed-partition bytes, not store bytes.
  */
class SnapshotDiffSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def freshRoot(): String =
    Files.createTempDirectory("snapdiff").resolve("store").toString

  /** The SnapshotStoreSpec fixture: victim 99 spans pt 0/1/2; pt 2 is
    * victim-only; pt 3..7 untouched by the retraction. */
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

  private def feed(df: org.apache.spark.sql.DataFrame) =
    df.select($"g", $"doc_id", $"change_type")
      .as[(String, Long, String)].collect().toSet

  test("added/removed equal the key-set algebra; survivor rewrites " +
      "contribute nothing; only changed partitions are read") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")               // v1
    SnapshotStore.compact(spark, root,                            // v2
      Seq(("g003", 900L), ("g011", 901L)).toDF("g", "doc_id")
        .withColumn("pt", (substring($"g", 2, 3).cast("int") % 8)),
      Seq("g", "doc_id"), "pt")
    SnapshotStore.retract(spark, root,                            // v3
      baseRows.filter($"doc_id" === 99L), Seq("g", "doc_id"), "pt")

    val d = SnapshotStore.diff(spark, root, 1L, 3L, Seq("g", "doc_id"))
    val want =
      Set(("g003", 900L, "added"), ("g011", 901L, "added")) ++
        Set("g000", "g008", "g001", "g002", "g010")
          .map(g => (g, 99L, "removed"))
    assert(feed(d) === want)

    // the retraction rewrote pt 0/1 survivors into NEW files — those
    // keys (500, 501, 502) exist in both versions and must not appear
    assert(!feed(d).exists(r => Set(500L, 501L, 502L)(r._2)),
      "a survivor rewrite leaked into the change feed")

    // PRUNING: the cycle touched pt 0/1/2 (retract) and pt 3 (both the
    // compact admits route there) — pt 4..7's files are identical in
    // both manifests and must never enter the plan
    val touched = Set("pt=0", "pt=1", "pt=2", "pt=3")
    val files = d.inputFiles
    assert(files.nonEmpty)
    val leaked = files.filterNot(f =>
      touched.exists(p => f.contains(s"/$p/")))
    assert(leaked.isEmpty,
      s"diff read outside the changed partitions:\n${leaked.mkString("\n")}")

    // symmetric intervals: v1->v2 is pure addition, v2->v3 pure removal
    assert(feed(SnapshotStore.diff(spark, root, 1L, 2L, Seq("g", "doc_id")))
      === Set(("g003", 900L, "added"), ("g011", 901L, "added")))
    assert(feed(SnapshotStore.diff(spark, root, 2L, 3L, Seq("g", "doc_id")))
      === Set("g000", "g008", "g001", "g002", "g010")
        .map(g => (g, 99L, "removed")))
  }

  test("a staged-delete commit (zero data files touched) falls back to " +
      "the full key diff and reports its removals") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")               // v1
    SnapshotStore.stageDeletes(spark, root,                       // v2
      baseRows.filter($"doc_id" === 99L).select($"g", $"doc_id"),
      Seq("g", "doc_id"))
    val d = SnapshotStore.diff(spark, root, 1L, 2L, Seq("g", "doc_id"))
    assert(feed(d) === Set("g000", "g008", "g001", "g002", "g010")
      .map(g => (g, 99L, "removed")),
      "MOR-staged removals missing from the feed")
  }

  test("the op walk SURVIVES VACUUM: retired roots persist as " +
      "metadata-only history, so a diff across a vacuumed interval " +
      "still prunes reorg commits the endpoint arm must re-read") {
    val root = freshRoot()
    def dirOf(f: String) = f.takeWhile(_ != '/')
    SnapshotStore.init(spark, root, baseRows, "pt")               // v1
    SnapshotStore.compact(spark, root,                            // v2: pt=3
      Seq(("g003", 900L)).toDF("g", "doc_id").withColumn("pt", lit(3)),
      Seq("g", "doc_id"), "pt")
    SnapshotStore.compact(spark, root,                            // v3: pt=5
      Seq(("g005", 905L)).toDF("g", "doc_id").withColumn("pt", lit(5)),
      Seq("g", "doc_id"), "pt")
    val (packed, _, _) = SnapshotStore.binPack(spark, root)       // v4: reorg
    assert(packed >= 2, "fixture degenerate: nothing fragmented")
    SnapshotStore.compact(spark, root,                            // v5: pt=0
      Seq(("g000x", 910L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
      Seq("g", "doc_id"), "pt")

    // vacuum retires v1/v3's roots into history (v2 pinned via
    // alsoRetain so the diff's FROM endpoint stays readable); the
    // binPack'd fragments and retired segments reclaim
    assert(SnapshotStore.vacuum(spark, root, keepVersions = 2,
      alsoRetain = Set(2L)) > 0)
    intercept[Exception] { SnapshotStore.snapshotAt(spark, root, 3L) }

    // diff(2,5) spans the vacuumed v3 and the v4 binPack: the walk
    // reads history metadata, attributes the pack as content-neutral,
    // and reads ONLY pt=5 (v3's admit) and pt=0 (v5's admit). pt=3 —
    // whose files the pack renamed — never enters the plan.
    val d = SnapshotStore.diff(spark, root, 2L, 5L, Seq("g", "doc_id"))
    assert(feed(d) ===
      Set(("g005", 905L, "added"), ("g000x", 910L, "added")))
    val touched = Set("pt=0", "pt=5")
    val leaked = d.inputFiles.filterNot(f =>
      touched.exists(p => f.contains(s"/$p/")))
    assert(leaked.isEmpty,
      s"post-vacuum walk read outside the data-changing dirs:\n" +
        leaked.mkString("\n"))
    // the counterfactual endpoint arm must re-read the packed pt=3 —
    // proving the history metadata is load-bearing
    val naive = SnapshotStore.diff(spark, root, 2L, 5L,
      Seq("g", "doc_id"), endpointNameSetOnly = true)
    assert(feed(naive) === feed(d))
    assert(naive.inputFiles.exists(_.contains("/pt=3/")),
      "the endpoint counterfactual no longer reads the packed dir — " +
        "the walk's post-vacuum pruning is untestable")
    // sanity: the pack really did rename pt=3's files between the
    // endpoints (else the endpoint arm would prune it too)
    val f2 = SnapshotStore.snapshotAt(spark, root, 2L).files
      .filter(dirOf(_) == "pt=3")
    val f5 = SnapshotStore.snapshotAt(spark, root, 5L).files
      .filter(dirOf(_) == "pt=3")
    assert(f2.toSet !== f5.toSet, "fixture degenerate: pt=3 unpacked")
  }

  test("identical versions diff to empty without reading anything") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")               // v1
    // an evolution commit carries the same files forward
    SnapshotStore.evolve(spark, root,
      Seq(org.apache.spark.sql.types.StructField("score",
        org.apache.spark.sql.types.IntegerType)))                 // v2
    val d = SnapshotStore.diff(spark, root, 1L, 2L, Seq("g", "doc_id"))
    assert(d.count() === 0L)
    assert(d.inputFiles.isEmpty,
      "an all-unchanged diff still read data files")
  }
}
