package graft.sources

import java.io.File
import java.nio.file.Files

import graft.{SparkTestBase, Tables}

/** CorpusExport must deliver the q_shard_assign contract physically:
  * one file per shard directory, and per-shard FILE ORDER equal to the
  * assignment query's `pos` order — training order implicit in the
  * layout, no position column materialized. */
class CorpusExportSpec extends SparkTestBase {
  import spark.implicits._

  test("per-shard file order equals q_shard_assign's pos order") {
    val dir = Files.createTempDirectory("corpus_export").toString
    val docs = Tables.table(spark, sf0001, "documents")
    CorpusExport.writeSharded(docs, dir)

    val want = graft.SparkEntry.queries("q_shard_assign")(spark, sf0001)
      .select($"shard", $"pos", $"doc_id")
      .as[(Int, Int, Long)].collect().toSeq
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toList).toMap

    val shardDirs = new File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty)
    val got = shardDirs.map { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      // ONE file per shard — the property that makes file order
      // well-defined (each shard's rows live in exactly one task)
      assert(parts.length == 1, s"${d.getName}: ${parts.length} files")
      val shard = d.getName.stripPrefix("shard=").toInt
      // single-file parquet read preserves row order
      shard -> spark.read.parquet(parts.head.getPath)
        .select($"doc_id").as[Long].collect().toList
    }.toMap

    assert(got.keySet == want.keySet)
    got.foreach { case (shard, ids) =>
      assert(ids == want(shard), s"shard $shard order diverges")
    }
    assert(got.values.map(_.size).sum ==
      want.values.map(_.size).sum)
  }

  test("q_corpus_export manifest chains equal chains computed from the " +
      "written files' physical order") {
    val dir = Files.createTempDirectory("corpus_manifest").toString
    val docs = Tables.table(spark, sf0001, "documents")
    CorpusExport.writeSharded(docs, dir)

    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString

    // per shard: doc_ids + char mass in FILE order from the written files
    val fromFiles = new File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map { d =>
        val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
        assert(parts.length == 1)
        val rows = spark.read.parquet(parts.head.getPath)
          .select($"doc_id",
            org.apache.spark.sql.functions.coalesce(
              org.apache.spark.sql.functions.length($"text"),
              org.apache.spark.sql.functions.lit(0)).cast("long"))
          .as[(Long, Long)].collect().toList
        d.getName.stripPrefix("shard=").toInt ->
          ((rows.size.toLong, rows.map(_._2).sum,
            md5hex(rows.map(_._1).mkString(","))))
      }.toMap

    val manifest = graft.SparkEntry.queries("q_corpus_export")(spark, sf0001)
      .select($"shard", $"n_docs", $"char_mass", $"id_chain_md5")
      .as[(Int, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    assert(manifest.keySet == fromFiles.keySet)
    manifest.foreach { case (shard, row) =>
      assert(row == fromFiles(shard), s"shard $shard manifest diverges")
    }
  }

  test("the full journey: curation-pipeline survivors export as a " +
      "sharded training corpus and read back whole") {
    // raw corpus -> curated survivor set -> shuffled sharded layout:
    // the end-to-end path a user of this engine actually runs
    val dir = Files.createTempDirectory("corpus_export_e2e").toString
    val survivors =
      graft.queries.CurationQueries.curationSurvivors(spark, sf0001)
    CorpusExport.writeSharded(survivors, dir, shards = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == survivors.count())
    // nothing lost, nothing duplicated, shard column materialized
    assert(back.select($"doc_id").distinct().count() == survivors.count())
    assert(back.select($"shard").distinct().count() > 1)
  }
}
