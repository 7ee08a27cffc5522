package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.SnapshotStore.ConcurrentCommitException

/** The segmented-manifest + per-file-stats contract (the r17 verdict's
  * missing #1/#2/#5 made real):
  *
  *  (a) SEGMENT REUSE: a commit rewrites ONLY touched partitions'
  *      segments — every untouched partition's pointer is copied
  *      verbatim (pointer IDENTITY, not just content equality), so
  *      commit cost is O(partitions + touched files), never
  *      O(live files);
  *  (b) STATS: every new file carries an exact row count and
  *      conservative per-column bounds, and per-partition stats sums
  *      equal the real row counts;
  *  (c) STAT-PRUNED SCANS: readRange plans ONLY files whose bounds
  *      overlap the requested range (inputFiles ⊆ overlapping files)
  *      and returns exactly the filtered rows;
  *  (d) OP-ATTRIBUTED DIFF: a diff across a binPack reads NOTHING
  *      (the walk knows a reorg step changes no rows) where the
  *      endpoint name-set comparison — the measured counterfactual —
  *      re-reads every packed partition;
  *  (e) STAGED-DELETE BOUND: the staged-delete diff fallback reads
  *      only files the delete keys' range can touch;
  *  (f) VALUE GRAIN: a retract + re-admit with a different payload
  *      reports 'changed' (membership grain: silence), and a re-admit
  *      with the IDENTICAL payload stays silent at both grains;
  *  (g) SIZE-TARGETED PACK: a skewed partition bins into parallel
  *      bounded files (every file ≤ target rows, pigeonhole ≥
  *      ⌈rows/target⌉ files) while small partitions still consolidate
  *      and single-file partitions keep their exact file.
  */
class SnapshotStatsSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private def freshRoot(): String =
    Files.createTempDirectory("snapstats").resolve("store").toString

  /** The SnapshotStoreSpec fixture: pt 0..7 populated. */
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

  private def dirOf(f: String) = f.takeWhile(_ != '/')

  test("concurrent commits to two stores leave the session's parquet " +
      "timestamp conf exactly as it was (the reference-counted scope: " +
      "a naive save/restore pair races and re-installs the other " +
      "writer's TIMESTAMP_MICROS for the rest of the session)") {
    val key = "spark.sql.parquet.outputTimestampType"
    val before = spark.conf.getOption(key)
    val roots = Seq(freshRoot(), freshRoot())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      (1 to 3).foreach { _ =>
        roots.foreach { r =>
          val fs = new org.apache.hadoop.fs.Path(r)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(new org.apache.hadoop.fs.Path(r), true)
        }
        roots.map(r => pool.submit(new java.lang.Runnable {
          def run(): Unit = {
            SnapshotStore.init(spark, r, baseRows, "pt"): Unit
            SnapshotStore.compact(spark, r,
              Seq(("gzzz", 9999L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
              Seq("g", "doc_id"), "pt"): Unit
          }
        })).foreach(_.get())
        assert(spark.conf.getOption(key) === before,
          "a concurrent writer leaked the timestamp conf into the session")
      }
    } finally pool.shutdown()
  }

  test("(a)+(b) a compact rewrites only the touched partition's " +
      "segment — untouched pointers are IDENTICAL — and every file " +
      "carries exact row counts and bounds") {
    val root = freshRoot()
    val v1 = SnapshotStore.init(spark, root, baseRows, "pt")
    assert(v1.segments.nonEmpty, "v1 manifest carried no segments")
    // stats: every data file counted and bounded
    v1.files.foreach { f =>
      val st = v1.stats.get(f)
      assert(st.exists(_.rows > 0L), s"$f missing row stats")
      assert(st.exists(s => s.mins.contains("doc_id") &&
        s.maxs.contains("doc_id") && s.mins.contains("g")),
        s"$f missing column bounds")
    }
    assert(v1.stats.values.map(_.rows).sum === baseRows.count())

    val (_, v2) = SnapshotStore.compact(spark, root,
      Seq(("g003", 900L)).toDF("g", "doc_id").withColumn("pt", lit(3)),
      Seq("g", "doc_id"), "pt")
    // pointer identity on every untouched partition
    v1.segments.keys.filterNot(_ == "pt=3").foreach { d =>
      assert(v2.segments(d) === v1.segments(d),
        s"untouched partition $d got a rewritten segment")
    }
    assert(v2.segments("pt=3") !== v1.segments("pt=3"),
      "the touched partition kept its stale segment")
    // the re-parsed manifest (from disk) agrees with the returned one
    val reread = SnapshotStore.snapshotAt(spark, root, 2L)
    assert(reread.segments === v2.segments)
    assert(reread.files === v2.files)
    assert(reread.op === SnapshotStore.OpCompact)
    assert(reread.stats.keySet === v2.files.toSet)
  }

  test("(b2) manifest stats are VALID against the files themselves: " +
      "exact row counts, bounds that contain every value — both the " +
      "pre-write fast arm and the binned readback arm") {
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")      // fast arm
    SnapshotStore.binPack(spark, root, minFilesToPack = 2,
      targetRowsPerFile = 1000L)                          // readback arm
    // (init leaves nothing fragmented; force the binned arm directly)
    SnapshotStore.compact(spark, root,
      Seq(("zz-extra", 9999L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
      Seq("g", "doc_id"), "pt")
    SnapshotStore.binPack(spark, root, targetRowsPerFile = 1000L)
    val snap = SnapshotStore.current(spark, root)
    val schema = SnapshotStore.schemaAt(spark, root, snap.version)
    snap.files.foreach { f =>
      val one = spark.read.schema(schema)
        .option("basePath", s"$root/data").parquet(s"$root/data/$f")
      val st = snap.stats(f)
      assert(st.rows === one.count(), s"$f row stat drifted")
      val r = one.agg(min($"doc_id"), max($"doc_id"), min($"g"), max($"g"))
        .collect()(0)
      assert(BigDecimal(st.mins("doc_id")) <= BigDecimal(r.getLong(0))
        && BigDecimal(st.maxs("doc_id")) >= BigDecimal(r.getLong(1)),
        s"$f doc_id bounds invalid: ${st.mins("doc_id")}..${st.maxs("doc_id")} " +
          s"vs ${r.getLong(0)}..${r.getLong(1)}")
      assert(st.mins("g") <= r.getString(2) && st.maxs("g") >= r.getString(3),
        s"$f g bounds invalid")
    }
  }

  test("(c) readRange plans only files whose bounds overlap and " +
      "returns exactly the filtered rows") {
    val root = freshRoot()
    // three commits with DISJOINT doc_id ranges: per-file bounds are
    // range-clustered, exactly the layout a time/id-ordered ingest makes
    val all = baseRows
    val v1 = SnapshotStore.init(spark, root,
      all.filter($"doc_id" < 510), "pt")
    SnapshotStore.compact(spark, root,
      all.filter($"doc_id" >= 510 && $"doc_id" < 700),
      Seq("g", "doc_id"), "pt")
    val v3 = SnapshotStore.compact(spark, root,
      all.filter($"doc_id" >= 700), Seq("g", "doc_id"), "pt")._2
    val midFiles = SnapshotStore.snapshotAt(spark, root, 2L).files.toSet
      .diff(v1.files.toSet)
    assert(midFiles.nonEmpty, "fixture degenerate: middle slice empty")

    val got = SnapshotStore.readRange(spark, root, "doc_id", 510L, 699L)
    assert(rowSet(got) ===
      rowSet(all.filter($"doc_id" >= 510 && $"doc_id" < 700)))
    val leaked = got.inputFiles.filterNot(f =>
      midFiles.exists(m => f.endsWith(m)))
    assert(leaked.isEmpty,
      s"readRange read outside the overlapping files:\n${leaked.mkString("\n")}")
    // open-ended + absent-stats degradation: a null bound keeps a side open
    assert(rowSet(SnapshotStore.readRange(spark, root, "doc_id", 700L, null,
      SnapshotStore.snapshotAt(spark, root, v3.version)))
      === rowSet(all.filter($"doc_id" >= 700)))
  }

  test("(c2) manifest-stat pruning reaches the DEFAULT read path: a " +
      "spark.sql WHERE on a registered view and a plain read().filter " +
      "scan only the overlapping files; an unfiltered read plans every " +
      "file") {
    val root = freshRoot()
    val all = baseRows
    SnapshotStore.init(spark, root, all.filter($"doc_id" < 510), "pt")
    SnapshotStore.compact(spark, root,
      all.filter($"doc_id" >= 510 && $"doc_id" < 700),
      Seq("g", "doc_id"), "pt")
    SnapshotStore.compact(spark, root,
      all.filter($"doc_id" >= 700), Seq("g", "doc_id"), "pt")
    val snap = SnapshotStore.current(spark, root)
    val midFiles = SnapshotStore.snapshotAt(spark, root, 2L).files.toSet
      .diff(SnapshotStore.snapshotAt(spark, root, 1L).files.toSet)
    assert(midFiles.nonEmpty)

    def scannedFiles(df: org.apache.spark.sql.DataFrame): Long = {
      df.queryExecution.executedPlan.foreach(_ => ()) // force planning
      df.collect()
      val scans = df.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.nonEmpty, "no FileSourceScan in the plan")
      scans.map(_.metrics("numFiles").value).sum
    }

    // SQL face: the WHERE's pushed predicates reach the FileIndex
    SnapshotStore.registerVersionView(spark, root, "snap_prune_default")
    val viaSql = spark.sql("SELECT g, doc_id FROM snap_prune_default " +
      "WHERE doc_id >= 510 AND doc_id <= 699")
    assert(scannedFiles(viaSql) === midFiles.size.toLong,
      "the SQL face scanned files the manifest bounds prove disjoint")
    assert(viaSql.as[(String, Long)].collect().toSet
      === rowSet(all.filter($"doc_id" >= 510 && $"doc_id" < 700)))
    spark.catalog.dropTempView("snap_prune_default")

    // DataFrame face: plain read().filter, no readRange in sight
    val viaDf = SnapshotStore.read(spark, root)
      .filter($"doc_id" >= 510 && $"doc_id" <= 699)
    assert(scannedFiles(viaDf) === midFiles.size.toLong,
      "read().filter scanned files the manifest bounds prove disjoint")
    assert(rowSet(viaDf)
      === rowSet(all.filter($"doc_id" >= 510 && $"doc_id" < 700)))

    // no over-pruning: an unfiltered read plans exactly every file
    val dataCount = snap.files.count(!_.startsWith("-")).toLong
    assert(scannedFiles(SnapshotStore.read(spark, root)) === dataCount,
      "an unfiltered read lost files to the pruning index")
  }

  test("(d) a diff across a binPack reads NOTHING through the op walk; " +
      "the endpoint name-set counterfactual re-reads every packed " +
      "partition") {
    val root = freshRoot()
    SnapshotStore.init(spark, root,
      baseRows.filter($"doc_id" % 2 === 0), "pt")                   // v1
    SnapshotStore.compact(spark, root, baseRows,
      Seq("g", "doc_id"), "pt")                                     // v2
    val (packed, _, v3) = SnapshotStore.binPack(spark, root)        // v3
    assert(packed >= 2, "fixture degenerate: nothing fragmented")
    assert(v3.op === SnapshotStore.OpBinPack)

    val d = SnapshotStore.diff(spark, root, 2L, 3L, Seq("g", "doc_id"))
    assert(d.count() === 0L)
    assert(d.inputFiles.isEmpty,
      "a pure-reorg interval still read data files through the walk")
    // counterfactual: endpoint name-set comparison must read the
    // packed partitions (this is the arm the op walk retires)
    val naive = SnapshotStore.diff(spark, root, 2L, 3L,
      Seq("g", "doc_id"), endpointNameSetOnly = true)
    assert(naive.count() === 0L)
    assert(naive.inputFiles.nonEmpty,
      "the counterfactual read nothing — the walk's pruning is untestable")
    // a data step + reorg step interval: reads ⊆ the data step's dirs
    val d13 = SnapshotStore.diff(spark, root, 1L, 3L, Seq("g", "doc_id"))
    assert(d13.select($"g", $"doc_id", $"change_type")
      .as[(String, Long, String)].collect().toSet
      === rowSet(baseRows.filter($"doc_id" % 2 === 1))
        .map(r => (r._1, r._2, "added")))
  }

  test("(e) the staged-delete fallback reads only files the delete " +
      "keys' range can touch") {
    val root = freshRoot()
    // doc_id-ranged commits again, so file bounds cluster
    SnapshotStore.init(spark, root,
      baseRows.filter($"doc_id" < 510), "pt")
    SnapshotStore.compact(spark, root,
      baseRows.filter($"doc_id" >= 510), Seq("doc_id"), "pt")
    val loFiles = SnapshotStore.snapshotAt(spark, root, 1L).files.toSet
    // stage deletes whose doc_id range lies entirely in the LOW slice
    SnapshotStore.stageDeletes(spark, root,
      baseRows.filter($"doc_id" === 99L).select($"doc_id").distinct(),
      Seq("doc_id"))                                                // v3
    val d = SnapshotStore.diff(spark, root, 2L, 3L, Seq("doc_id"))
    assert(d.select($"doc_id").as[Long].collect().toSet === Set(99L))
    assert(d.select($"change_type").distinct().as[String].collect().toSeq
      === Seq("removed"))
    val leaked = d.inputFiles.filterNot(f =>
      loFiles.exists(m => f.endsWith(m)) || f.contains("/deletes/"))
    assert(leaked.isEmpty,
      s"staged-delete diff read past the key bound:\n${leaked.mkString("\n")}")
  }

  test("(f) value grain: retract + re-admit with a NEW payload reports " +
      "'changed'; an identical re-admit is silent at both grains") {
    val root = freshRoot()
    val rows = Seq(("k1", 10L, 0), ("k2", 20L, 0), ("k3", 30L, 1))
      .toDF("g", "doc_id", "pt")
    SnapshotStore.init(spark, root, rows, "pt")                     // v1
    SnapshotStore.retract(spark, root,
      rows.filter($"g" isin ("k1", "k3")), Seq("g"), "pt")          // v2
    // k1 re-enters with a DIFFERENT doc_id, k3 with the IDENTICAL row
    SnapshotStore.compact(spark, root,
      Seq(("k1", 11L, 0), ("k3", 30L, 1)).toDF("g", "doc_id", "pt"),
      Seq("g"), "pt")                                               // v3
    val membership = SnapshotStore.diff(spark, root, 1L, 3L, Seq("g"))
    assert(membership.count() === 0L,
      "membership grain must net out a leave-and-re-enter")
    val values = SnapshotStore.diff(spark, root, 1L, 3L, Seq("g"),
      valueGrain = true)
    assert(values.select($"g", $"doc_id", $"change_type")
      .as[(String, Long, String)].collect().toSet
      === Set(("k1", 11L, "changed")),
      "value grain must report exactly the payload change, with toV's row")
  }

  test("(g) size-targeted pack: a hot partition bins into parallel " +
      "bounded files, small partitions consolidate, single-file " +
      "partitions keep their exact file") {
    val root = freshRoot()
    val hot = (0 until 1000).map(i => (f"h$i%04d", i.toLong, 0))
    val cold = (0 until 100).flatMap(i =>
      Seq((f"c$i%04d", 2000L + i, 1), (f"d$i%04d", 3000L + i, 2)))
    val all = (hot ++ cold).toDF("g", "doc_id", "pt")
    // two half-slices fragment pt 0/1/2; the lone pt=9 row stays single
    SnapshotStore.init(spark, root, all.filter($"doc_id" % 2 === 0), "pt")
    SnapshotStore.compact(spark, root, all, Seq("g", "doc_id"), "pt")
    SnapshotStore.compact(spark, root,
      Seq(("lone", 9999L, 9)).toDF("g", "doc_id", "pt"),
      Seq("g", "doc_id"), "pt")
    val before = SnapshotStore.current(spark, root)
    val want = rowSet(SnapshotStore.read(spark, root, before))
    val loneFiles = before.files.filter(dirOf(_) == "pt=9")
    assert(loneFiles.size === 1)

    val (packed, _, after) =
      SnapshotStore.binPack(spark, root, targetRowsPerFile = 300L)
    assert(packed === 3)
    val byDir = after.files.groupBy(dirOf)
    // pigeonhole: 1000 rows at ≤300/file needs ≥4 files — IN PARALLEL
    // (the shuffle keys on (partition, bin); one-file mode would write
    // the hot partition through a single task)
    assert(byDir("pt=0").size >= 4 && byDir("pt=0").size <= 10,
      s"hot partition binned into ${byDir("pt=0").size} files")
    byDir("pt=0").foreach { f =>
      assert(after.stats(f).rows <= 300L,
        s"$f exceeds the target: ${after.stats(f).rows} rows")
    }
    // cold partitions (100 rows each) consolidate to one file
    Seq("pt=1", "pt=2").foreach(d => assert(byDir(d).size === 1,
      s"$d not consolidated: ${byDir(d)}"))
    assert(byDir("pt=9") === loneFiles,
      "an already-packed partition was rewritten")
    assert(rowSet(SnapshotStore.read(spark, root)) === want,
      "the size-targeted pack changed the store's content")
  }

  test("(h) binned writes compute stats PRE-WRITE: a size-targeted " +
      "pack takes ZERO full-readback passes, and every file's stats — " +
      "including maxRecordsPerFile splits — are exact against the " +
      "files themselves") {
    val root = freshRoot()
    val hot = (0 until 1000).map(i => (f"h$i%04d", i.toLong, 0))
    val cold = (0 until 100).map(i => (f"c$i%04d", 2000L + i, 1))
    val all = (hot ++ cold).toDF("g", "doc_id", "pt")
    SnapshotStore.init(spark, root, all.filter($"doc_id" % 2 === 0), "pt")
    SnapshotStore.compact(spark, root, all, Seq("g", "doc_id"), "pt")
    val want = rowSet(SnapshotStore.read(spark, root))

    // target 100 over 1000 hot rows → 10 hash bins averaging exactly
    // the cap, so some bin overflows and maxRecordsPerFile SPLITS its
    // cell (deterministic: the bin hash is a fixed function of the
    // fixture) — the arm whose rows come from footer-only counts
    val before = SnapshotStore.readbackRuns.get()
    val (packed, _, after) =
      SnapshotStore.binPack(spark, root, targetRowsPerFile = 100L)
    assert(packed === 2)
    assert(SnapshotStore.readbackRuns.get() === before,
      "a binned commit took the full post-write readback arm")
    val byDir = after.files.groupBy(dirOf)
    assert(byDir("pt=0").size > 10,
      s"fixture degenerate: no bin overflowed into a split " +
        s"(${byDir("pt=0").size} files) — raise the row count")
    // exactness against the files: rows exact (splits included), sums
    // exact, bounds contain every value; a silent drift in the
    // task-assignment replication fails HERE, not as a wrong prune
    val schema = SnapshotStore.schemaAt(spark, root, after.version)
    assert(after.stats.values.map(_.rows).sum === want.size.toLong)
    byDir("pt=0").foreach { f =>
      val one = spark.read.schema(schema)
        .option("basePath", s"$root/data").parquet(s"$root/data/$f")
      val st = after.stats(f)
      assert(st.rows === one.count(), s"$f row stat drifted")
      assert(st.rows <= 100L, s"$f exceeds maxRecordsPerFile")
      val r = one.agg(min($"doc_id"), max($"doc_id")).collect()(0)
      assert(BigDecimal(st.mins("doc_id")) <= BigDecimal(r.getLong(0)) &&
        BigDecimal(st.maxs("doc_id")) >= BigDecimal(r.getLong(1)),
        s"$f bounds invalid")
    }
    assert(rowSet(SnapshotStore.read(spark, root)) === want,
      "the pack changed content")
  }

  test("(i) STATS-DRIVEN MAINTENANCE POLICY: the plan picks exactly " +
      "the fragmented + hot partitions from the manifest alone, the " +
      "targeted pack heals them without touching healthy ones, and a " +
      "re-plan is empty (idempotent)") {
    val root = freshRoot()
    // pt=0 FRAGMENTED: three tiny commits; pt=1 HOT single file (800
    // rows, no fragmentation to see by file count); pt=2 healthy
    // single small file; pt=3 hot via two oversized files
    def slice(pt: Int, lo: Int, n: Int) =
      (lo until lo + n).map(i => (f"k$pt%02d_$i%05d", i.toLong, pt))
        .toDF("g", "doc_id", "pt")
    SnapshotStore.init(spark, root,
      slice(0, 0, 10).unionByName(slice(1, 0, 800))
        .unionByName(slice(2, 0, 20)).unionByName(slice(3, 0, 300)), "pt")
    SnapshotStore.compact(spark, root,
      slice(0, 100, 10).unionByName(slice(3, 1000, 300)),
      Seq("g", "doc_id"), "pt")
    SnapshotStore.compact(spark, root, slice(0, 200, 10),
      Seq("g", "doc_id"), "pt")
    val before = SnapshotStore.current(spark, root)
    val want = rowSet(SnapshotStore.read(spark, root))
    val healthyFiles = before.files.filter(dirOf(_) == "pt=2")
    assert(healthyFiles.size === 1)

    val plan = SnapshotStore.maintenancePlan(spark, root,
      minFilesToPack = 2, targetRowsPerFile = 100L, hotFactor = 4L)
    assert(plan.fragmented === Seq("pt=0"),
      s"fragmented misdiagnosed: ${plan.fragmented}")
    assert(plan.hot === Seq("pt=1", "pt=3"),
      s"hot misdiagnosed: ${plan.hot}")
    assert(plan.dirs === Seq("pt=0", "pt=1", "pt=3"))

    val (packed, _, after) = SnapshotStore.binPack(spark, root,
      minFilesToPack = 2, targetRowsPerFile = 100L, dirs = plan.dirs)
    assert(packed === 3)
    val byDir = after.files.groupBy(dirOf)
    // the fragmented partition consolidates; the hot ones split into
    // parallel bounded files the file-count policy alone never touches
    assert(byDir("pt=0").size === 1)
    assert(byDir("pt=1").size >= 8, s"hot pt=1: ${byDir("pt=1").size}")
    byDir("pt=1").foreach(f => assert(after.stats(f).rows <= 100L))
    assert(byDir("pt=3").size >= 6)
    assert(byDir("pt=2") === healthyFiles,
      "the policy rewrote a healthy partition")
    assert(rowSet(SnapshotStore.read(spark, root)) === want,
      "the policy pack changed content")

    // idempotence: the healed store plans nothing, and the loop's
    // policy arm would therefore commit nothing
    val replan = SnapshotStore.maintenancePlan(spark, root,
      minFilesToPack = 2, targetRowsPerFile = 100L, hotFactor = 4L)
    assert(replan.isEmpty,
      s"re-plan not empty: ${replan.fragmented} / ${replan.hot}")
  }

  test("a 16-writer race through the conditional-put arm produces one " +
      "winner; the precondition-less shim measurably grants many claims " +
      "— the seam is load-bearing, not decorative") {
    val root = freshRoot()
    val v1 = SnapshotStore.init(spark, root, baseRows, "pt")

    // the HAZARD: a store whose PUT carries no precondition (multipart
    // upload semantics) degrades the claim to HEAD-then-PUT
    val hazard = new SnapshotStore.ObjectStoreShim(
      preconditionSupported = false)
    val hazardThreads = (0 until 16).map { _ =>
      new Thread(() => { hazard.putIfAbsent("claims/v2", Array.empty); () })
    }
    hazardThreads.foreach(_.start()); hazardThreads.foreach(_.join())
    assert(hazard.grants.get() > 1,
      s"the precondition-less shim granted ${hazard.grants.get()} claims — " +
        "expected the TOCTOU to expose multiple grants; widen the sleep " +
        "if this is ever 1 by luck")

    // the FIX: 16 commits racing through ConditionalPutClaim — the
    // real protocol end to end, exactly one version lands
    val store = new SnapshotStore.ObjectStoreShim()
    val arm = new SnapshotStore.ConditionalPutClaim(store)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 16).map { i =>
      new Thread(() =>
        try {
          SnapshotStore.commit(spark, root, v1.files, v1.version, arm)
          results.add(s"win-$i")
        } catch {
          case _: ConcurrentCommitException => results.add(s"refused-$i")
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val (wins, refused) = results.asScala.toSeq.partition(_.startsWith("win"))
    assert(wins.size === 1 && refused.size === 15,
      s"conditional-put arbitration failed: $wins / $refused")
    assert(store.grants.get() === 1)
    assert(SnapshotStore.current(spark, root).version === 2L)
    assert(rowSet(SnapshotStore.read(spark, root)) === rowSet(baseRows))
  }

  test("a transient create fault surfaces as a FAULT, not as a lost " +
      "race; a genuine exists-collision reported as generic IOException " +
      "still reads as lost") {
    import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath}
    import org.apache.hadoop.fs.permission.FsPermission
    import org.apache.hadoop.util.Progressable
    // a filesystem whose create always throws (the failed-close /
    // datanode-hiccup shape); non-"file" scheme so the claim takes the
    // FileSystem arm rather than the java.nio fast path
    class FaultyFs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "faulty"
      // RawLocalFileSystem routes FileSystem.create(f, overwrite)
      // through the permission-less variant — override both so every
      // entry path faults
      override def create(f: HPath, overwrite: Boolean, bufferSize: Int,
          replication: Short, blockSize: Long, progress: Progressable)
          : FSDataOutputStream =
        throw new java.io.IOException("transient datanode fault")
      override def create(f: HPath, permission: FsPermission,
          overwrite: Boolean, bufferSize: Int, replication: Short,
          blockSize: Long, progress: Progressable): FSDataOutputStream =
        throw new java.io.IOException("transient datanode fault")
    }
    val fs = new FaultyFs
    fs.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val dir = Files.createTempDirectory("claimfault")
    val absent = new HPath(dir.resolve("v2.claim").toString)
    // absent claim + transient fault => the fault PROPAGATES (the old
    // arm returned false here — a retriable fault misdiagnosed as a
    // concurrent writer, wedging the version)
    val ex = intercept[java.io.IOException] {
      SnapshotStore.ExclusiveCreateClaim.claim(fs, absent)
    }
    assert(ex.getMessage.contains("transient"))
    // present claim + generic IOException => lost race (some stores
    // report exists-collisions this way; an EMPTY body carries no
    // writer tag, so the conservative legacy classification holds)
    val present = dir.resolve("v3.claim")
    Files.createFile(present)
    assert(!SnapshotStore.ExclusiveCreateClaim.claim(fs,
      new HPath(present.toString)))
    // present claim bearing ANOTHER writer's tag => unambiguously lost
    val theirs = dir.resolve("v4.claim")
    Files.write(theirs, "other-writer-uuid".getBytes("UTF-8"))
    assert(!SnapshotStore.ExclusiveCreateClaim.claim(fs,
      new HPath(theirs.toString)))
  }

  test("a half-landed OWN claim is recognized by its writer tag: a " +
      "create that lands and then faults on close reads back as WON, " +
      "not as a lost race that wedges the version") {
    import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath}
    import org.apache.hadoop.fs.permission.FsPermission
    import org.apache.hadoop.util.Progressable
    // a filesystem whose create SUCCEEDS and flushes the body, but
    // whose close throws — the failed-close-after-namenode-create
    // shape the r18 verdict named: the old arm classified this as
    // "lost the race" though no concurrent winner exists, wedging the
    // version until a manual breakClaim with no fault to investigate
    class CloseFaultFs extends org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "faulty"
      private def wrap(real: FSDataOutputStream): FSDataOutputStream =
        new FSDataOutputStream(new java.io.FilterOutputStream(real) {
          override def close(): Unit = {
            real.close() // the data IS durable before the fault
            throw new java.io.IOException("close fault after landing")
          }
        }, null)
      override def create(f: HPath, overwrite: Boolean, bufferSize: Int,
          replication: Short, blockSize: Long, progress: Progressable)
          : FSDataOutputStream =
        wrap(super.create(f, overwrite, bufferSize, replication,
          blockSize, progress))
      override def create(f: HPath, permission: FsPermission,
          overwrite: Boolean, bufferSize: Int, replication: Short,
          blockSize: Long, progress: Progressable): FSDataOutputStream =
        wrap(super.create(f, permission, overwrite, bufferSize,
          replication, blockSize, progress))
    }
    val fs = new CloseFaultFs
    fs.initialize(new java.net.URI("file:///"),
      spark.sparkContext.hadoopConfiguration)
    val dir = Files.createTempDirectory("claimtag")
    val p = new HPath(dir.resolve("v2.claim").toString)
    assert(SnapshotStore.ExclusiveCreateClaim.claim(fs, p),
      "a landed own claim was misclassified as a lost race")
    // the claim file exists and carries the winner's tag
    assert(Files.size(dir.resolve("v2.claim")) > 0)
    // and a SECOND claimant against the now-present claim loses cleanly
    assert(!SnapshotStore.ExclusiveCreateClaim.claim(fs, p))
  }

  test("evolve races: 16 concurrent evolves admit exactly one schema " +
      "record; a crashed post-claim writer's orphan record is cleaned " +
      "by breakClaim with the stale claim") {
    import org.apache.spark.sql.types.{IntegerType, StructField}
    val root = freshRoot()
    SnapshotStore.init(spark, root, baseRows, "pt")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 16).map { i =>
      new Thread(() =>
        try {
          SnapshotStore.evolve(spark, root,
            Seq(StructField(s"col_$i", IntegerType)))
          results.add(s"win-$i")
        } catch {
          case _: ConcurrentCommitException => results.add(s"refused-$i")
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val wins = results.asScala.toSeq.filter(_.startsWith("win"))
    assert(wins.size === 1, s"evolve race: $wins")
    val winnerCol = s"col_${wins.head.stripPrefix("win-")}"
    // exactly ONE schema record exists, and it is the winner's — a
    // loser writing its record pre-claim was the r17 ADVICE bug
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val recs = fs.listStatus(
      new org.apache.hadoop.fs.Path(root, "_schemas")).map(_.getPath.getName)
    assert(recs.toSeq === Seq("s000000002.json"))
    assert(SnapshotStore.read(spark, root).columns.contains(winnerCol))

    // crash window: a writer that claims v3, writes its record, and
    // dies before publishing — prePublish throwing AFTER the record
    // write reproduces it exactly
    val base = SnapshotStore.current(spark, root)
    intercept[RuntimeException] {
      SnapshotStore.commit(spark, root, base.files, base.version,
        prePublish = () => {
          val rec = new org.apache.hadoop.fs.Path(root,
            "_schemas/s000000003.json")
          val o = fs.create(rec, false)
          try o.write("{}".getBytes("UTF-8")) finally o.close()
          throw new RuntimeException("writer died post-claim")
        })
    }
    // the version is wedged loudly (fail-stop)...
    intercept[ConcurrentCommitException] {
      SnapshotStore.commit(spark, root, base.files, base.version)
    }
    // ...and breakClaim clears the claim AND the orphan record, so the
    // next version-3 commit cannot inherit a dead writer's schema
    assert(SnapshotStore.breakClaim(spark, root, 3L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(root,
      "_schemas/s000000003.json")),
      "breakClaim left the dead writer's schema record to attach to " +
        "whatever commit lands as version 3")
    val v3 = SnapshotStore.commit(spark, root, base.files, base.version)
    assert(v3.version === 3L)
    assert(SnapshotStore.read(spark, root).columns.toSeq
      === SnapshotStore.readAt(spark, root, 2L).columns.toSeq)
  }
}
