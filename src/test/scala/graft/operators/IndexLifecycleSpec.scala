package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.catalyst.TableIdentifier

/** The composed maintenance lifecycle's physical contract: on ONE
  * partition-routed index, a compaction round (admits in) and a
  * retraction round (delete-list out) are BOTH increment-bound file
  * operations —
  *
  *  (a) compactPartitioned appends exactly the unseen identities,
  *      never rewriting an existing file (append-only: the base
  *      part-file name-sets survive as subsets);
  *  (b) the subsequent fold rewrites only the tombstone-affected
  *      partitions;
  *  (c) a partition untouched by BOTH ops keeps its exact part files
  *      across the whole cycle;
  *  (d) the final contents equal base ∪ admits − dead under keep-first
  *      identity semantics, and both ops are idempotent. */
class IndexLifecycleSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  private val Store = "lifecycle_spec_store"
  private val Tomb = "lifecycle_spec_tomb"

  private def files(table: String): Map[Int, Set[String]] = {
    val loc = new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(TableIdentifier(table)).location.toString).getPath
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(loc)).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .toSeq.groupBy(_.getParent.getFileName.toString.stripPrefix("pt=").toInt)
      .map { case (pt, ps) => pt -> ps.map(_.getFileName.toString).toSet }
  }

  test("compact appends without rewriting, fold rewrites only affected, " +
      "untouched partitions survive the whole cycle byte-identical") {
    try {
      // base: keys k0..k29 owned by doc 100+k, routed pt = k % 6.
      // admits: keys k20..k39 owned by doc 200+k (k20..k29 ALSO
      // re-admitted under doc 100+k — those identities must drop).
      // dead: doc 105's postings (keys k5 — pt 5) and doc 222's (k22 —
      // pt 4). pt 0..3 see the compact append (k24..k39 rows) but only
      // pt 4/5 see the fold; pt 1 gets NO admits and NO deletes if we
      // route admits away from it — instead pin subset-survival for
      // compact and exact-survival across the fold for every
      // unaffected pt.
      def rows(ks: Range, ownerOf: Int => Long) =
        ks.map(k => (f"k$k%03d", ownerOf(k), k % 6)).toDF("g", "doc_id", "pt")
      rows(0 until 30, k => 100L + k)
        .repartition($"pt")
        .write.partitionBy("pt").format("parquet").saveAsTable(Store)
      val base = files(Store)

      val admits = rows(20 until 40, k => if (k < 30) 100L + k else 200L + k)
      val appended = IndexCompact.compactPartitioned(
        spark, Store, admits, Seq("g", "doc_id"), "pt")
      assert(appended === 10L, "only the 10 unseen identities may append")
      val afterCompact = files(Store)
      afterCompact.foreach { case (pt, fs) =>
        assert(base(pt).subsetOf(fs),
          s"compact rewrote existing files in pt=$pt")
      }
      // idempotent: the same admits add nothing
      assert(IndexCompact.compactPartitioned(
        spark, Store, admits, Seq("g", "doc_id"), "pt") === 0L)
      val afterCompact2 = files(Store)

      // takedown: doc 105 (key k005, pt 5) and doc 230 (key k030, pt 0)
      val dead = Seq(("k005", 105L, 5), ("k030", 230L, 0))
        .toDF("g", "doc_id", "pt")
      IndexRetract.tombstone(spark, Tomb, dead)
      val stats = IndexRetract.fold(spark, Store, Tomb, "pt", Seq("g", "doc_id"))
      assert(stats.partitionsRewritten === 2 && stats.rowsRemoved === 2L)

      val afterFold = files(Store)
      afterCompact2.keys.filterNot(Set(0, 5)).foreach { pt =>
        assert(afterFold(pt) === afterCompact2(pt),
          s"fold touched unaffected partition pt=$pt")
      }

      // final contents: base ∪ admits − dead under identity keep-first
      val expected = (
        (0 until 30).map(k => (f"k$k%03d", 100L + k)) ++
          (30 until 40).map(k => (f"k$k%03d", 200L + k))
        ).toSet -- Set(("k005", 105L), ("k030", 230L))
      assert(spark.table(Store).select($"g", $"doc_id")
        .as[(String, Long)].collect().toSet === expected)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $Store")
      spark.sql(s"DROP TABLE IF EXISTS $Tomb")
    }
  }
}
