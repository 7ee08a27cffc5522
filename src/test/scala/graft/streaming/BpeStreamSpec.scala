package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming BPE face must agree row-for-row with the batch
  * `q_doc_bpe_apply` on a replayed corpus — across micro-batch
  * boundaries, under the SAME offline-trained merge table — with the two
  * documented divergences only (null-text docs emit no row; everything
  * else identical). A synthetic third micro-batch exercises the
  * stream-only paths: an out-of-vocabulary word that still partially
  * merges (the true BPE OOV semantics the batch vocab join never sees),
  * a paren word on the per-character fallback, and a null-text doc.
  * Zero state rows at any arrival count. */
class BpeStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming BPE equals the batch twin on a replayed corpus") {
    val dir = Files.createTempDirectory("docs_stream_bpe")
    val docs = Tables.table(spark, sf0001, "documents")
    val mid = 300L
    stageFile(docs.filter($"doc_id" < mid), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" >= mid), dir, "b1.parquet",
      1700000100000L)
    stageFile(
      Seq((9001L, null: String, "en", "fixture", 0L),
          (9002L, "(x)y zzznovel", "en", "fixture", 13L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir, "b2.parquet", 1700000200000L)

    // offline training — the same helper the batch queries share,
    // over the same corpus-derived word table
    val words = docs
      .select(explode(graft.queries.TextQueries.tokens(lower($"text")))
        .as("w"))
      .filter(length($"w") >= 2 && !$"w".rlike("[()]"))
      .groupBy($"w").agg(count(lit(1)).as("cnt"))
      .select(regexp_replace($"w", "(.)", "($1)").as("seg"), $"cnt")
    val merges = graft.queries.TextQueries.bpeMerges(words)
      .map(m => (m._2, m._3))
    assert(merges.nonEmpty)

    val out = DocStream.applyBpe(
      DocStream.readDocs(spark, dir.toString), merges)
    val q = EventStream.runToMemory(out.toDF(), "bpe_stream",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("bpe_stream")
      .as[(Long, Long, Long, Double)].collect().toSet

    // batch twin on the same corpus (its training words ARE the ones
    // the merges were trained on): every non-null-text doc must match
    val batch = graft.SparkEntry
      .queries("q_doc_bpe_apply")(spark, sf0001)
      .filter($"ws_tokens" > 0)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got.filter(_._1 < 9000L) === batch)

    // synthetic pins: the paren word costs its char count; the novel
    // word still merges under trained pairs (so its BPE count is
    // strictly below its char count unless no trained pair applies —
    // compute the reference segmentation in plain Scala)
    def applyRef(w: String): Long =
      if (w.exists(c => c == '(' || c == ')')) w.length.toLong
      else merges.foldLeft(w.map(_.toString).toVector) { case (s, (l, r)) =>
        val b = Vector.newBuilder[String]
        var k = 0
        while (k < s.length) {
          if (k + 1 < s.length && s(k) == l && s(k + 1) == r) {
            b += (l + r); k += 2
          } else { b += s(k); k += 1 }
        }
        b.result()
      }.length.toLong
    val expect9002 = (9002L, 2L,
      applyRef("(x)y") + applyRef("zzznovel"),
      math.floor((applyRef("(x)y") + applyRef("zzznovel")).toDouble / 2
        * 10000 + 0.5) / 10000)
    assert(got.find(_._1 == 9002L).contains(expect9002))
    assert(!got.exists(_._1 == 9001L))

    val peakState = q.recentProgress
      .map(_.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
    assert(peakState === 0L,
      s"applyBpe must never store state, saw $peakState rows")
  }
}
