package graft.operators

import graft.SparkTestBase
import graft.operators.IndexRetract.FoldStats
import org.apache.spark.sql.catalyst.TableIdentifier

/** The delete-propagation op's physical contract, pinned where it
  * matters — the claims are about FILES, not DataFrames:
  *
  *  (a) fold removes exactly the tombstoned identities (set equality
  *      with the anti-join replay) and equals the merge-on-read view
  *      taken BEFORE the fold (MOR == COW — a reader never sees
  *      different data depending on whether maintenance ran yet);
  *  (b) partitions no tombstone routes to keep their EXACT part files
  *      (name-set equality — a rewrite always mints fresh UUID names,
  *      so unchanged names prove untouched bytes), while affected
  *      partitions' files are replaced;
  *  (c) a partition whose every row dies has its directory dropped
  *      outright (dynamic overwrite alone would leave its stale files);
  *  (d) folding the same delete-list again removes nothing
  *      (idempotence — re-runs of a failed maintenance round are safe);
  *  (e) the pruned rewrite reads ONLY affected directories
  *      (inputFiles ⊆ affected partitions — the cost model the 100 TB
  *      claim rests on). */
class IndexRetractSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val Store = "retract_spec_store"
  private val Tomb = "retract_spec_tomb"

  /** (g, doc_id, pt) fixture postings. Victim doc 99 appears in
    * pt 0 (keys g000/g008, each with a survivor), pt 1 (key g001 with a
    * survivor; g009 is survivor-only), and pt 2 (keys g002/g010,
    * victim-ONLY — the all-dead partition). pt 3..7 hold survivor-only
    * keys and must come through byte-untouched. */
  private def fixture = {
    val rows =
      Seq(("g000", 99L), ("g000", 500L), ("g008", 99L), ("g008", 501L),
        ("g001", 99L), ("g001", 502L), ("g009", 503L),
        ("g002", 99L), ("g010", 99L)) ++
        (3 to 7).flatMap(k => Seq((f"g$k%03d", 600L + k), (f"g${k + 8}%03d", 700L + k)))
    rows.toDF("g", "doc_id")
      .withColumn("pt", (substring($"g", 2, 3).cast("int") % 8))
  }

  private def tableFiles(table: String): Map[Int, Set[String]] = {
    val loc = new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).location.toString).getPath
    val root = java.nio.file.Paths.get(loc)
    if (!java.nio.file.Files.exists(root)) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq.groupBy { p =>
          p.getParent.getFileName.toString.stripPrefix("pt=").toInt
        }.map { case (pt, ps) => pt -> ps.map(_.getFileName.toString).toSet }
    }
  }

  test("fold removes tombstoned identities partition-pruned: MOR == COW, " +
      "untouched partitions byte-identical, all-dead directory dropped, " +
      "idempotent") {
    try {
      fixture.write.partitionBy("pt").format("parquet").saveAsTable(Store)
      val dead = fixture.filter($"doc_id" === 99L)
      val expected = fixture.filter($"doc_id" =!= 99L)
        .select($"g", $"doc_id").as[(String, Long)].collect().toSet

      IndexRetract.tombstone(spark, Tomb, dead)
      val mor = IndexRetract.readMor(spark, Store, Tomb, Seq("g", "doc_id"))
        .select($"g", $"doc_id").as[(String, Long)].collect().toSet
      assert(mor === expected, "merge-on-read view wrong before the fold")

      val before = tableFiles(Store)
      val stats = IndexRetract.fold(spark, Store, Tomb, "pt", Seq("g", "doc_id"))
      assert(stats === FoldStats(partitionsRewritten = 3, rowsRemoved = 5L,
        partitionsDropped = 1))

      val got = spark.table(Store).select($"g", $"doc_id")
        .as[(String, Long)].collect().toSet
      assert(got === expected, "COW result diverges from the MOR view")

      val after = tableFiles(Store)
      (3 to 7).foreach { pt =>
        assert(after(pt) === before(pt),
          s"unaffected partition pt=$pt was rewritten (part-file names changed)")
      }
      Seq(0, 1).foreach { pt =>
        assert(after(pt).nonEmpty && after(pt) != before(pt),
          s"affected partition pt=$pt kept its stale part files")
      }
      assert(!after.contains(2), "all-victims partition pt=2 still has files")

      // the cost model: the pruned read touches only affected directories
      val pruned = spark.table(Store).filter($"pt".isin(0, 1))
      assert(pruned.inputFiles.nonEmpty &&
        pruned.inputFiles.forall(f => f.contains("pt=0") || f.contains("pt=1")),
        s"pruned read leaked outside affected partitions:\n" +
          pruned.inputFiles.mkString("\n"))

      // idempotence: the tombstone table was folded away...
      assert(!spark.catalog.tableExists(Tomb))
      assert(IndexRetract.fold(spark, Store, Tomb, "pt", Seq("g", "doc_id"))
        === FoldStats(0, 0L, 0))
      // ...and re-staging the same delete-list removes nothing more
      IndexRetract.tombstone(spark, Tomb, dead)
      val again = IndexRetract.fold(spark, Store, Tomb, "pt", Seq("g", "doc_id"))
      assert(again.rowsRemoved === 0L, "second fold of the same delete-list removed rows")
      assert(spark.table(Store).select($"g", $"doc_id")
        .as[(String, Long)].collect().toSet === expected)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $Store")
      spark.sql(s"DROP TABLE IF EXISTS $Tomb")
    }
  }

  test("composite-identity retraction (the media band-index shape)") {
    try {
      // band rows: identity = (band_idx, band_val, hist_id), routed on
      // the probe key's band_val — the IndexCompactSpec fixture's shape
      def rows(ids: Range) = {
        import org.apache.spark.sql.functions.col
        ids.flatMap(i => (0 until 4).map(b =>
            (b, (i % 7).toLong * 16 + b, i.toLong)))
          .toDF("band_idx", "band_val", "hist_id")
          .withColumn("pt", (col("band_val") % 8).cast("int"))
      }
      rows(0 until 100).repartition(col("pt"))
        .write.partitionBy("pt").format("parquet").saveAsTable(Store)
      // takedown of history item 7: its 4 band rows, across partitions
      IndexRetract.tombstone(spark, Tomb,
        rows(0 until 100).filter($"hist_id" === 7L))
      val stats = IndexRetract.fold(spark, Store, Tomb, "pt",
        Seq("band_idx", "band_val", "hist_id"))
      assert(stats.rowsRemoved === 4L)
      val got = spark.table(Store)
        .select($"band_idx", $"band_val", $"hist_id")
        .as[(Int, Long, Long)].collect().toSet
      val expect = rows(0 until 100)
        .filter($"hist_id" =!= 7L)
        .select($"band_idx", $"band_val", $"hist_id")
        .as[(Int, Long, Long)].collect().toSet
      assert(got === expect)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $Store")
      spark.sql(s"DROP TABLE IF EXISTS $Tomb")
    }
  }

  test("tombstone routing type mismatch (LONG vs the store's INT) never " +
      "deletes survivor partitions") {
    try {
      // store routed on an INT pt; the tombstone frame carries pt as
      // LONG (a caller deriving it with a different cast — the joins
      // and isin coerce silently, so nothing upstream fails). The old
      // driver-side boxed filterNot compared java.lang.Long against
      // java.lang.Integer, matched nothing, flagged every affected
      // partition fully dead, and deleted the just-rewritten directory
      // of pt=0 — which still holds a survivor.
      Seq(("g-a", 99L), ("g-a", 500L), ("g-b", 501L))
        .toDF("g", "doc_id")
        .withColumn("pt", lit(0))
        .write.partitionBy("pt").format("parquet").saveAsTable(Store)
      IndexRetract.tombstone(spark, Tomb,
        Seq(("g-a", 99L)).toDF("g", "doc_id")
          .withColumn("pt", lit(0L))) // LONG routing value
      val stats = IndexRetract.fold(spark, Store, Tomb, "pt",
        Seq("g", "doc_id"))
      assert(stats === FoldStats(partitionsRewritten = 1,
        rowsRemoved = 1L, partitionsDropped = 0))
      assert(spark.table(Store).select($"g", $"doc_id")
        .as[(String, Long)].collect().toSet
        === Set(("g-a", 500L), ("g-b", 501L)),
        "survivors lost under a coerced tombstone routing type")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $Store")
      spark.sql(s"DROP TABLE IF EXISTS $Tomb")
    }
  }

  test("all-victims partition with a string routing value needing path " +
      "escaping is really dropped") {
    try {
      // 'k:1' needs Spark's partition-path escaping (dir pt=k%3A1); the
      // old raw s"$partCol=$v" delete was a silent no-op on it, so the
      // 'forgotten' rows resurfaced in the store after the fold
      Seq(("g-x", 7L, "k:1"), ("g-y", 8L, "plain"))
        .toDF("g", "doc_id", "pt")
        .write.partitionBy("pt").format("parquet").saveAsTable(Store)
      IndexRetract.tombstone(spark, Tomb,
        Seq(("g-x", 7L, "k:1")).toDF("g", "doc_id", "pt"))
      val stats = IndexRetract.fold(spark, Store, Tomb, "pt",
        Seq("g", "doc_id"))
      assert(stats.partitionsDropped === 1)
      assert(spark.table(Store).select($"g", $"doc_id")
        .as[(String, Long)].collect().toSet === Set(("g-y", 8L)),
        "rows of the escaped-path all-victims partition resurfaced")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $Store")
      spark.sql(s"DROP TABLE IF EXISTS $Tomb")
    }
  }

  test("owner re-election falls out of the postings grain") {
    try {
      // g-shared: victim 10 owns (min); survivors 20, 30. After the
      // retraction the owner view must re-elect 20 — and g-solo (held
      // only by the victim) must vanish.
      Seq(("g-shared", 10L), ("g-shared", 20L), ("g-shared", 30L),
        ("g-solo", 10L)).toDF("g", "doc_id")
        .withColumn("pt", lit(0))
        .write.partitionBy("pt").format("parquet").saveAsTable(Store)
      IndexRetract.tombstone(spark, Tomb,
        spark.table(Store).filter($"doc_id" === 10L))
      IndexRetract.fold(spark, Store, Tomb, "pt", Seq("g", "doc_id"))
      val owners = spark.table(Store).groupBy($"g")
        .agg(min($"doc_id").as("owner"))
        .as[(String, Long)].collect().toMap
      assert(owners === Map("g-shared" -> 20L))
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $Store")
      spark.sql(s"DROP TABLE IF EXISTS $Tomb")
    }
  }
}
