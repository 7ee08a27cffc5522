package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** The r18 ADVICE findings against the manifest stat bounds — each one
  * an incorrect-pruning hazard on non-ASCII or timestamp data:
  *
  *  (a) ORDER MISMATCH: Spark computes string min/max in UTF-8 binary
  *      (code-point) order; comparing bounds with `String.compareTo`
  *      (UTF-16 unit order) diverges for supplementary characters vs
  *      [U+E000,U+FFFF] and could PROVE false disjointness — a file
  *      holding matching astral-plane rows was skipped;
  *  (b) SURROGATE-UNSAFE TRUNCATION/INCREMENT: `take(64)` can cut a
  *      surrogate pair in half and char-increment can mint U+D800 —
  *      both produce unpaired surrogates the URL-encoded manifest
  *      mangles to '?', silently SHRINKING the stored upper bound;
  *  (c) TIMESTAMP RENDERING: `Timestamp.toString` always emits '.0',
  *      Spark's cast trims zero fractions — '…05' < '…05.0'
  *      lexicographically wrongly pruned boundary-equal files;
  *  (d) `.tmp-` MANIFEST ORPHANS: a crash between the temp-manifest
  *      write and the claim leaked `.tmp-*` files vacuum never
  *      reclaimed.
  */
class SnapshotBoundsSpec extends SparkTestBase {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("snapbounds").resolve("store").toString

  /** U+1F600, one astral code point (surrogate pair in UTF-16). */
  private val Astral = new String(Character.toChars(0x1F600))
  private val MaxCp = new String(Character.toChars(0x10FFFF))

  test("(a) astral-plane rows survive stat pruning: UTF-8 byte order, " +
      "not UTF-16 unit order, decides file overlap") {
    val root = freshRoot()
    // two commits → two files with disjoint g-ranges: one ASCII-low,
    // one holding ONLY an astral-prefixed key
    val v1 = SnapshotStore.init(spark, root,
      Seq(("a-low", 1L, 0)).toDF("g", "doc_id", "pt"), "pt")
    SnapshotStore.compact(spark, root,
      Seq((s"$Astral-doc", 2L, 0)).toDF("g", "doc_id", "pt"),
      Seq("g", "doc_id"), "pt")
    // query range [U+E000, ∞): in code-point order U+E000 < U+1F600 so
    // the astral file OVERLAPS; in UTF-16 unit order the astral file's
    // max starts with the high surrogate 0xD83D < 0xE000, so the old
    // compare proved it disjoint and silently dropped the row
    val got = SnapshotStore.readRange(spark, root, "g", "", null)
    assert(got.select($"g", $"doc_id").as[(String, Long)].collect().toSet
      === Set((s"$Astral-doc", 2L)),
      "an astral-plane row was pruned by the UTF-16 comparison")
    // pruning itself still works: the ASCII-low file stays out of plan
    val leakedLow = got.inputFiles.filter(f =>
      v1.files.exists(m => f.endsWith(m)))
    assert(leakedLow.isEmpty, "stat pruning stopped pruning entirely")
  }

  test("(b) code-point increment and truncation: no unpaired " +
      "surrogates ever reach a stored bound, and long-astral-string " +
      "bounds stay valid") {
    // unit arms — the exact hazards the ADVICE named
    assert(SnapshotStore.incLast("a퟿") === Some("a"),
      "incrementing U+D7FF must skip the surrogate gap to U+E000")
    assert(SnapshotStore.incLast(MaxCp) === None,
      "U+10FFFF alone has no increment — must carry (here: None)")
    assert(SnapshotStore.incLast("a" + MaxCp) === Some("b"),
      "carry past a maximal code point must increment the previous one")
    assert(SnapshotStore.cpTake(Astral * 3, 2) === Astral * 2,
      "cpTake must count code points, not UTF-16 units")

    // end-to-end: a 70-code-point astral string exceeds the 64-cp
    // prefix bound; the stored max must be a VALID string (no unpaired
    // surrogate) and a true upper bound in UTF-8 byte order
    val root = freshRoot()
    val long = Astral * 70
    val snap = SnapshotStore.init(spark, root,
      Seq((long, 1L, 0)).toDF("g", "doc_id", "pt"), "pt")
    val dataFile = snap.files.filterNot(_.startsWith("-")).head
    val mx = snap.stats(dataFile).maxs("g")
    val wellFormed = {
      var i = 0; var ok = true
      while (i < mx.length && ok) {
        val c = mx.charAt(i)
        if (Character.isHighSurrogate(c)) {
          ok = i + 1 < mx.length && Character.isLowSurrogate(mx.charAt(i + 1))
          i += 2
        } else { ok = !Character.isLowSurrogate(c); i += 1 }
      }
      ok
    }
    assert(wellFormed, s"stored max carries an unpaired surrogate: $mx")
    assert(java.util.Arrays.compareUnsigned(
      mx.getBytes("UTF-8"), long.getBytes("UTF-8")) > 0,
      "the truncated-incremented max is not an upper bound")
    // and the row is reachable through readRange at its exact value
    assert(SnapshotStore.readRange(spark, root, "g", long, long).count() === 1L)
  }

  test("(c) a timestamp query endpoint equal to a file's max keeps the " +
      "file: bounds compare as instants, not renderings") {
    val root = freshRoot()
    val ts = java.sql.Timestamp.valueOf("2024-01-01 03:04:05")
    val early = java.sql.Timestamp.valueOf("2023-06-01 00:00:00")
    val v1 = SnapshotStore.init(spark, root,
      Seq((early, 1L, 0)).toDF("ts", "doc_id", "pt"), "pt")
    SnapshotStore.compact(spark, root,
      Seq((ts, 2L, 0)).toDF("ts", "doc_id", "pt"),
      Seq("ts", "doc_id"), "pt")
    // the file's manifest max renders trimmed ('…05'); the query
    // endpoint renders as Timestamp.toString ('…05.0') — the old
    // lexicographic compare pruned the boundary-equal file
    val got = SnapshotStore.readRange(spark, root, "ts", ts, null)
    assert(got.select($"doc_id").as[Long].collect().toSet === Set(2L),
      "a boundary-equal timestamp row was pruned by rendering drift")
    // pruning still engages: the early file stays out of the plan
    assert(got.inputFiles.forall(f => !v1.files.exists(m => f.endsWith(m))),
      "timestamp stat pruning stopped pruning entirely")
  }

  test("(d) vacuum reclaims aged .tmp- manifest orphans under the " +
      "grace window and leaves an in-flight writer's fresh temp alone") {
    val root = freshRoot()
    SnapshotStore.init(spark, root,
      Seq(("g1", 1L, 0), ("g2", 2L, 1)).toDF("g", "doc_id", "pt"), "pt")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val mdir = new org.apache.hadoop.fs.Path(root, "_manifests")
    val dead = new org.apache.hadoop.fs.Path(mdir, ".tmp-deadwriter")
    val live = new org.apache.hadoop.fs.Path(mdir, ".tmp-inflight")
    Seq(dead, live).foreach { p =>
      val o = fs.create(p, false); o.write("x".getBytes); o.close()
    }
    fs.setTimes(dead, System.currentTimeMillis() - 2 * 3600 * 1000L, -1)
    SnapshotStore.vacuum(spark, root, keepVersions = 1,
      graceMs = 3600 * 1000L)
    assert(!fs.exists(dead),
      "an aged crashed-writer temp manifest survived vacuum")
    assert(fs.exists(live),
      "vacuum reclaimed an in-flight writer's temp inside the grace window")
    SnapshotStore.vacuum(spark, root, keepVersions = 1)
    assert(!fs.exists(live), "single-writer mode must reclaim the orphan")
  }
}
