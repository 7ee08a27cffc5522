package graft.sources

import java.io.File
import java.nio.file.Files

import graft.{SparkTestBase, Tables}

/** Right-to-be-forgotten must reach the training files themselves —
  * and must NOT cost a corpus rewrite or scramble training order:
  *
  *  (a) only the delete-list's shard directories are touched
  *      (untouched shards keep their exact part files — name-set
  *      equality, a rewrite always mints fresh names);
  *  (b) the forgotten doc_ids are gone and every survivor remains;
  *  (c) a rewritten shard's FILE ORDER still equals q_shard_assign's
  *      pos order restricted to survivors — deleting a doc closes the
  *      gap, it does not reshuffle the stream. */
class ForgetExportSpec extends SparkTestBase {
  import spark.implicits._

  private def shardFiles(dir: String): Map[Int, Set[String]] =
    new File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
      .map(d => d.getName.stripPrefix("shard=").toInt ->
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(_.getName).toSet)
      .toMap

  test("forgetDocs rewrites only the delete-list's shards and preserves " +
      "training order among survivors") {
    val dir = Files.createTempDirectory("forget_export").toString
    val docs = Tables.table(spark, sf0001, "documents")
    CorpusExport.writeSharded(docs, dir)
    val before = shardFiles(dir)

    val assign = graft.SparkEntry.queries("q_shard_assign")(spark, sf0001)
      .select($"shard", $"pos", $"doc_id")
      .as[(Int, Int, Long)].collect().toSeq

    // three victims in (at most) three shards
    val deadIds = Seq(3L, 57L, 201L)
    val deadShards = assign.filter(r => deadIds.contains(r._3))
      .map(_._1).toSet
    assert(deadShards.nonEmpty)
    val touched = CorpusExport.forgetDocs(dir,
      deadIds.toDF("doc_id"))
    assert(touched === deadShards.size)

    val after = shardFiles(dir)
    (before.keySet -- deadShards).foreach { s =>
      assert(after(s) === before(s),
        s"unaffected shard=$s was rewritten")
    }
    deadShards.foreach { s =>
      assert(after(s).nonEmpty && after(s) != before(s),
        s"affected shard=$s kept its stale files")
    }

    // contents: every survivor, no victim
    val ids = spark.read.parquet(dir).select($"doc_id")
      .as[Long].collect().toSet
    assert(deadIds.forall(id => !ids.contains(id)))
    assert(ids === assign.map(_._3).toSet -- deadIds)

    // file order in rewritten shards = assignment order minus victims
    deadShards.foreach { s =>
      val d = new File(dir, s"shard=$s")
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"shard=$s: ${parts.length} files")
      val fileOrder = spark.read.parquet(parts.head.getPath)
        .select($"doc_id").as[Long].collect().toList
      val want = assign.filter(_._1 == s).sortBy(_._2).map(_._3)
        .filterNot(deadIds.contains)
      assert(fileOrder === want, s"shard=$s training order scrambled")
    }
  }
}
