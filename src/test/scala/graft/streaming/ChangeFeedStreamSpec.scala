package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase
import graft.sources.SnapshotStore

/** The snapshot store's STREAMING change-feed face — the incremental
  * consumer contract (Delta CDF's streaming read):
  *
  *  (a) PER-COMMIT GRAIN: each emitted `commit_version=<v>` batch
  *      equals `diff(v-1, v)` exactly, and a binPack commit emits an
  *      EMPTY batch (the op walk knows a reorg changes no rows);
  *  (b) FOLD: applying the batches in version order onto the baseline
  *      version's rows lands exactly on the final version's rows;
  *  (c) RESTART: the cursor is the sink listing, so a consumer resumed
  *      mid-stream — even with a FRESH checkpoint — continues from
  *      where the sink left off, and a replayed version repairs its
  *      directory instead of duplicating rows;
  *  (d) ZERO STATE: the live face carries no streaming state store at
  *      all.
  */
class ChangeFeedStreamSpec extends SparkTestBase {
  import spark.implicits._

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

  private def foldOnto(base: Set[(String, Long)],
      sinkDir: String): Set[(String, Long)] = {
    val events = spark.read.parquet(sinkDir)
      .select($"commit_version", $"g", $"doc_id", $"change_type")
      .as[(Long, String, Long, String)].collect()
    events.groupBy(_._1).toSeq.sortBy(_._1)
      .foldLeft(base) { case (state, (_, evs)) =>
        val adds = evs.filter(_._4 == "added").map(e => (e._2, e._3)).toSet
        val removes = evs.filter(_._4 == "removed").map(e => (e._2, e._3)).toSet
        state -- removes ++ adds
      }
  }

  test("(a)+(b)+(c) per-commit batches fold onto the baseline to the " +
      "final version; a reorg emits empty; resume and replay are " +
      "idempotent off the sink listing alone") {
    val root = Files.createTempDirectory("cfeed").resolve("store").toString
    val sink = Files.createTempDirectory("cfeed_sink").resolve("feed").toString
    SnapshotStore.init(spark, root,
      baseRows.filter($"doc_id" % 3 === 1), "pt")                   // v1
    SnapshotStore.compact(spark, root, baseRows,
      Seq("g", "doc_id"), "pt")                                     // v2
    SnapshotStore.retract(spark, root,
      baseRows.filter($"doc_id" === 99L), Seq("g", "doc_id"), "pt") // v3

    // first catch-up: two unfolded commits
    assert(DocStream.changeFeedOnce(spark, root, Seq("g", "doc_id"),
      sink) === 2L)
    // the consumer "crashes" here; the store advances without it
    val (packed, _, _) = SnapshotStore.binPack(spark, root)         // v4
    assert(packed >= 2, "fixture degenerate: nothing fragmented")
    SnapshotStore.compact(spark, root,
      Seq(("g-new", 900L)).toDF("g", "doc_id").withColumn("pt", lit(3)),
      Seq("g", "doc_id"), "pt")                                     // v5
    // resume: the sink listing IS the cursor — exactly the two new
    // commits emit, nothing re-emits
    assert(DocStream.changeFeedOnce(spark, root, Seq("g", "doc_id"),
      sink) === 2L)
    assert(DocStream.changeFeedOnce(spark, root, Seq("g", "doc_id"),
      sink) === 0L)

    // (a) per-commit grain: v3's batch equals diff(2,3); the binPack
    // version's batch is EMPTY
    val v3batch = spark.read.parquet(s"$sink/commit_version=3")
    assert(v3batch.select($"g", $"doc_id", $"change_type")
      .as[(String, Long, String)].collect().toSet
      === SnapshotStore.diff(spark, root, 2L, 3L, Seq("g", "doc_id"))
        .select($"g", $"doc_id", $"change_type")
        .as[(String, Long, String)].collect().toSet)
    assert(spark.read.parquet(s"$sink/commit_version=4").count() === 0L,
      "a pure-reorg commit leaked rows into the feed")

    // (b) fold: baseline v1 + batches v2..v5 == the store at v5
    assert(foldOnto(rowSet(SnapshotStore.readAt(spark, root, 1L)), sink)
      === rowSet(SnapshotStore.read(spark, root)),
      "folding the streamed batches missed the final version")

    // (c) replay repairs: delete version 5's directory (the coarse
    // crash shape) — the next pass re-emits exactly it, and the fold
    // is unchanged
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$sink/commit_version=5"), true)
    assert(DocStream.changeFeedOnce(spark, root, Seq("g", "doc_id"),
      sink) === 1L)
    assert(foldOnto(rowSet(SnapshotStore.readAt(spark, root, 1L)), sink)
      === rowSet(SnapshotStore.read(spark, root)))

    // (c2) the REAL mid-write crash shape (the r18 ADVICE finding):
    // Spark creates the directory before the job commits, so a crash
    // leaves a PARTIAL dir without _SUCCESS. A listing-only cursor
    // counted it folded and silently lost the version; the
    // marker-gated cursor re-emits and repairs it.
    val v5dir = new org.apache.hadoop.fs.Path(s"$sink/commit_version=5")
    fs.delete(new org.apache.hadoop.fs.Path(v5dir, "_SUCCESS"), false)
    assert(DocStream.changeFeedOnce(spark, root, Seq("g", "doc_id"),
      sink) === 1L,
      "a marker-less partial directory was counted as folded — that " +
        "version's changes are silently lost")
    assert(fs.exists(new org.apache.hadoop.fs.Path(v5dir, "_SUCCESS")))
    assert(foldOnto(rowSet(SnapshotStore.readAt(spark, root, 1L)), sink)
      === rowSet(SnapshotStore.read(spark, root)))
  }

  test("(e) VALUE GRAIN: the streaming feed carries 'changed' rows (a " +
      "respec's re-routed payloads), folds onto the baseline to the " +
      "final version's full rows, and a marker-less crash replays") {
    val root = Files.createTempDirectory("cfeedv").resolve("store").toString
    val sink = Files.createTempDirectory("cfeedv_sink").resolve("feed").toString
    val keys = Seq("g", "doc_id")
    SnapshotStore.init(spark, root, baseRows, "pt")                  // v1
    SnapshotStore.compact(spark, root,
      Seq(("g-new", 900L)).toDF("g", "doc_id").withColumn("pt", lit(3)),
      keys, "pt")                                                    // v2
    // the one-commit payload change: a re-spec re-routes pt=3's rows
    // under a new derivation — pt is DATA (partition-last layout), so
    // the value grain honestly reports the re-routed rows as 'changed'
    val (rerouted, _) = SnapshotStore.respec(spark, root,
      pmod($"doc_id", lit(16)).cast("int"), Seq("pt=3"))             // v3
    assert(rerouted === 1)

    assert(DocStream.changeFeedOnce(spark, root, keys, sink,
      valueGrain = true) === 2L)
    val v3batch = spark.read.parquet(s"$sink/commit_version=3")
      .select($"g", $"doc_id", $"pt", $"change_type")
      .as[(String, Long, Int, String)].collect()
    assert(v3batch.exists(_._4 == "changed"),
      "the re-spec's payload changes are missing at value grain")
    assert(v3batch.forall(_._4 == "changed"),
      "a pure re-route must emit no membership changes")

    def foldVals(base: Map[(String, Long), Int]): Map[(String, Long), Int] = {
      val events = spark.read.parquet(sink)
        .select($"commit_version", $"g", $"doc_id", $"pt", $"change_type")
        .as[(Long, String, Long, Int, String)].collect()
      events.groupBy(_._1).toSeq.sortBy(_._1)
        .foldLeft(base) { case (st, (_, evs)) =>
          val rm = evs.filter(_._5 == "removed").map(e => (e._2, e._3))
          val up = evs.filter(e => e._5 == "added" || e._5 == "changed")
            .map(e => (e._2, e._3) -> e._4)
          st -- rm ++ up
        }
    }
    def fullRows(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"doc_id", $"pt").as[(String, Long, Int)]
        .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(foldVals(fullRows(SnapshotStore.readAt(spark, root, 1L)))
      === fullRows(SnapshotStore.read(spark, root)),
      "value-grain folding missed the final version's payloads")

    // marker-less crash mid-replay: v3's partial dir must re-emit
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$sink/commit_version=3/_SUCCESS"), false)
    assert(DocStream.changeFeedOnce(spark, root, keys, sink,
      valueGrain = true) === 1L)
    assert(foldVals(fullRows(SnapshotStore.readAt(spark, root, 1L)))
      === fullRows(SnapshotStore.read(spark, root)))
  }

  test("(g) GROUP GRAIN: per-group-version member batches fold onto " +
      "mutually-consistent member states, an enrollment bootstraps as " +
      "'added', a marker-less group version re-emits whole, and a " +
      "moved member without keys is refused loudly") {
    import graft.sources.SnapshotGroup
    val dir = Files.createTempDirectory("gfeed")
    val aRoot = dir.resolve("postings").toString
    val bRoot = dir.resolve("bands").toString
    val cRoot = dir.resolve("scores").toString
    val gRoot = dir.resolve("group").toString
    val sink = dir.resolve("feed").toString
    SnapshotStore.init(spark, aRoot,
      Seq(("g1", 10L, 0), ("g2", 20L, 1)).toDF("g", "doc_id", "pt"), "pt")
    SnapshotStore.init(spark, bRoot,
      Seq(("b1", 10L, 0)).toDF("band", "doc_id", "pt"), "pt")
    SnapshotGroup.init(spark, gRoot,
      Map("postings" -> aRoot, "bands" -> bRoot))              // gv1
    SnapshotGroup.transact(spark, gRoot) { txn =>              // gv2: both
      txn.compact("postings",
        Seq(("g3", 30L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
        Seq("g", "doc_id"), "pt"): Unit
      txn.retract("bands",
        Seq(("b1", 10L)).toDF("band", "doc_id").withColumn("pt", lit(0)),
        Seq("band", "doc_id"), "pt"): Unit
    }
    SnapshotGroup.transact(spark, gRoot) { txn =>              // gv3: one
      txn.compact("postings",
        Seq(("g4", 40L)).toDF("g", "doc_id").withColumn("pt", lit(1)),
        Seq("g", "doc_id"), "pt"): Unit
    }
    SnapshotStore.init(spark, cRoot,
      Seq(("s1", 100L, 0), ("s2", 200L, 0)).toDF("k", "doc_id", "pt"), "pt")
    SnapshotGroup.enroll(spark, gRoot, "scores", cRoot)        // gv4

    val keys = Map("postings" -> Seq("g", "doc_id"),
      "bands" -> Seq("band", "doc_id"), "scores" -> Seq("k", "doc_id"))
    assert(DocStream.groupChangeFeedOnce(spark, gRoot, keys, sink) === 3L)
    assert(DocStream.groupChangeFeedOnce(spark, gRoot, keys, sink) === 0L)

    // gv3 touched ONLY postings — bands has no batch there
    val fs = new org.apache.hadoop.fs.Path(sink)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$sink/group_version=3/member=bands")),
      "an unmoved member grew a batch")
    // the enrollment bootstraps the new member as pure 'added'
    val boot = spark.read.parquet(s"$sink/group_version=4/member=scores")
    assert(boot.select($"k", $"doc_id", $"change_type")
      .as[(String, Long, String)].collect().toSet
      === Set(("s1", 100L, "added"), ("s2", 200L, "added")))

    // fold every member's batches onto its gv1 baseline (scores: empty
    // baseline — it did not exist in the group) → current group state
    def pairsOf(df: org.apache.spark.sql.DataFrame, c1: String)
        : Set[(String, Long)] =
      df.select(col(c1), $"doc_id").as[(String, Long)].collect().toSet
    def foldMember(name: String, c1: String,
        base: Set[(String, Long)]): Set[(String, Long)] =
      (2L to 4L).foldLeft(base) { case (st, gv) =>
        val p = s"$sink/group_version=$gv/member=$name"
        if (!fs.exists(new org.apache.hadoop.fs.Path(p))) st
        else {
          val evs = spark.read.parquet(p)
            .select(col(c1), $"doc_id", $"change_type")
            .as[(String, Long, String)].collect()
          val rm = evs.filter(_._3 == "removed").map(e => (e._1, e._2)).toSet
          val add = evs.filter(e => e._3 == "added" || e._3 == "changed")
            .map(e => (e._1, e._2)).toSet
          st -- rm ++ add
        }
      }
    val g1 = SnapshotGroup.snapshotAt(spark, gRoot, 1L)
    assert(foldMember("postings", "g",
      pairsOf(SnapshotGroup.read(spark, gRoot, "postings", g1), "g"))
      === pairsOf(SnapshotGroup.read(spark, gRoot, "postings"), "g"))
    assert(foldMember("bands", "band",
      pairsOf(SnapshotGroup.read(spark, gRoot, "bands", g1), "band"))
      === pairsOf(SnapshotGroup.read(spark, gRoot, "bands"), "band"))
    assert(foldMember("scores", "k", Set.empty)
      === pairsOf(SnapshotGroup.read(spark, gRoot, "scores"), "k"))

    // crash between member writes: the group marker is the commit
    // point — a marker-less version re-emits WHOLE and repairs
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$sink/group_version=4/_GROUP_SUCCESS"), false)
    assert(DocStream.groupChangeFeedOnce(spark, gRoot, keys, sink) === 1L)
    assert(spark.read.parquet(s"$sink/group_version=4/member=scores")
      .count() === 2L)

    // a moved member missing from keysByMember refuses loudly
    SnapshotGroup.transact(spark, gRoot) { txn =>              // gv5
      txn.compact("bands",
        Seq(("b9", 90L)).toDF("band", "doc_id").withColumn("pt", lit(0)),
        Seq("band", "doc_id"), "pt"): Unit
    }
    intercept[IllegalArgumentException] {
      DocStream.groupChangeFeedOnce(spark, gRoot,
        keys - "bands", sink)
    }
    assert(DocStream.groupChangeFeedOnce(spark, gRoot, keys, sink) === 1L)
  }

  test("(d) the live face follows a store other writers advance, with " +
      "zero streaming state, and a restart under a FRESH checkpoint " +
      "resumes from the sink") {
    val root = Files.createTempDirectory("cfeedl").resolve("store").toString
    val sink = Files.createTempDirectory("cfeedl_sink").resolve("feed").toString
    SnapshotStore.init(spark, root,
      baseRows.filter($"doc_id" % 3 === 1), "pt")                   // v1
    SnapshotStore.compact(spark, root, baseRows,
      Seq("g", "doc_id"), "pt")                                     // v2

    def runUntilCaughtUp(): Unit = {
      val ticks = new java.util.concurrent.atomic.AtomicLong(0L)
      val q = DocStream.changeFeed(spark, root, Seq("g", "doc_id"), sink,
          onTick = _ => { ticks.incrementAndGet(); () })
        .trigger(Trigger.ProcessingTime(100))
        .option("checkpointLocation",
          Files.createTempDirectory("cfeedl_ckpt").toString)
        .start()
      try {
        val deadline = System.currentTimeMillis() + 60000
        // catch-up is read off the SINK LISTING (the loop must do the
        // emitting; the check may not)
        def foldedMax(): Long = {
          val p = new org.apache.hadoop.fs.Path(sink)
          val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          if (!fs.exists(p)) 1L
          else fs.listStatus(p).map(_.getPath.getName)
            .filter(_.startsWith("commit_version="))
            .map(_.stripPrefix("commit_version=").toLong)
            .foldLeft(1L)(math.max)
        }
        def caughtUp(): Boolean =
          foldedMax() == SnapshotStore.current(spark, root).version &&
            ticks.get() >= 1
        while (!caughtUp() && System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        assert(caughtUp(), "live feed never caught up")
        // zero streaming state: foreachBatch over a rate tick carries
        // no state operators at all
        Option(q.lastProgress).foreach(p =>
          assert(p.stateOperators.isEmpty,
            "the change-feed loop grew a state store"))
      } finally q.stop()
    }
    runUntilCaughtUp()
    // the store advances while no consumer runs...
    SnapshotStore.retract(spark, root,
      baseRows.filter($"doc_id" === 99L), Seq("g", "doc_id"), "pt") // v3
    // ...and a RESTARTED consumer (fresh checkpoint — the sink is the
    // cursor) folds the missed commit
    runUntilCaughtUp()
    assert(foldOnto(rowSet(SnapshotStore.readAt(spark, root, 1L)), sink)
      === rowSet(SnapshotStore.read(spark, root)))
  }
}
