package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}
import graft.streaming.StageFiles.stageFile

/** The streaming BYTE-level BPE face must agree row-for-row with the
  * batch `q_doc_bpe_bytes_apply` on a replayed corpus — across
  * micro-batch boundaries, under the SAME offline-trained merge table —
  * with the null/empty-doc row as the ONLY divergence (no paren guard,
  * no OOV arm: the byte level's no-OOV contract means the stream and
  * batch apply the identical replace chain to every pretoken). A
  * synthetic third micro-batch pins the stream-only arrivals: a novel
  * multi-script pretoken that still partially merges, a paren-bearing
  * pretoken that segments like any other (NOT a fallback), and a
  * null-text doc. Zero state rows at any arrival count. */
class BpeBytesStreamSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming byte-BPE equals the batch twin on a replayed corpus, " +
      "no-OOV semantics included") {
    val dir = Files.createTempDirectory("docs_stream_bpebytes")
    val docs = Tables.table(spark, sf0001, "documents")
    val mid = 300L
    stageFile(docs.filter($"doc_id" < mid), dir, "b0.parquet",
      1700000000000L)
    stageFile(docs.filter($"doc_id" >= mid), dir, "b1.parquet",
      1700000100000L)
    stageFile(
      Seq((9001L, null: String, "en", "fixture", 0L),
          (9002L, "(zz)y 日本語テキスト the", "en", "fixture", 13L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      dir, "b2.parquet", 1700000200000L)

    // offline training — the same helpers the batch query shares
    import graft.queries.TextQueries
    val words = TextQueries.bpeBytesTok(docs)
      .filter(length(encode($"pt", "UTF-8")) >= 2)
      .groupBy($"pt").agg(sum($"c").as("cnt"))
      .select(TextQueries.bpeBytesSeg($"pt").as("seg"), $"cnt")
    val merges = TextQueries
      .bpeMerges(words, TextQueries.BpeBytesMergeCount)
      .map(m => (m._2, m._3))
    assert(merges.nonEmpty)

    val out = DocStream.applyBpeBytes(
      DocStream.readDocs(spark, dir.toString), merges)
    val q = EventStream.runToMemory(out.toDF(), "bpebytes_stream",
      OutputMode.Append())
    q.processAllAvailable(); q.stop()
    val got = spark.table("bpebytes_stream")
      .as[(Long, Long, Long, Long, Double)].collect().toSet

    val batch = graft.SparkEntry
      .queries("q_doc_bpe_bytes_apply")(spark, sf0001)
      .filter($"pretokens" > 0)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    assert(got.filter(_._1 < 9000L) === batch)

    // synthetic pins via an independent byte-vector reference: the
    // paren and CJK pretokens segment under the SAME chain (no
    // fallback arm to diverge through)
    def hexSyms(pt: String): Vector[String] =
      pt.getBytes("UTF-8").toVector.map(b => f"${b & 0xFF}%02X")
    def applyRef(pt: String): Long =
      merges.foldLeft(hexSyms(pt)) { case (s, (l, r)) =>
        val b = Vector.newBuilder[String]
        var k = 0
        while (k < s.length) {
          if (k + 1 < s.length && s(k) == l && s(k + 1) == r) {
            b += (l + r); k += 2
          } else { b += s(k); k += 1 }
        }
        b.result()
      }.length.toLong
    def pretok(t: String): Seq[String] = {
      val m = java.util.regex.Pattern
        .compile(TextQueries.BpeBytesPretokRegex).matcher(t)
      val out = Seq.newBuilder[String]
      while (m.find()) out += m.group()
      out.result()
    }
    val pts = pretok("(zz)y 日本語テキスト the")
    val bytes = pts.map(_.getBytes("UTF-8").length.toLong).sum
    val bpe = pts.map(applyRef).sum
    val expect9002 = (9002L, pts.size.toLong, bytes, bpe,
      math.floor(bytes.toDouble / bpe * 10000 + 0.5) / 10000)
    assert(got.find(_._1 == 9002L).contains(expect9002))
    assert(!got.exists(_._1 == 9001L))
    // the rank-1 merge always fuses two SINGLE bytes (no earlier merge
    // exists to build from), so its decoded 2-byte pretoken must fully
    // merge through the streamed chain — pins the hex-decode → seg →
    // replace plumbing without depending on corpus stats. Decode via
    // raw bytes (NOT a charset round trip, which would rewrite any
    // >= 0x80 byte under UTF-8 re-encoding).
    val (l1, r1) = merges.head
    val pairBytes = (l1 + r1).grouped(2)
      .map(h => Integer.parseInt(h, 16).toByte).toArray
    val pairSyms = pairBytes.toVector.map(b => f"${b & 0xFF}%02X")
    assert(pairSyms.size === 2)
    assert(merges.foldLeft(pairSyms) { case (s, (l, r)) =>
      val b = Vector.newBuilder[String]
      var k = 0
      while (k < s.length) {
        if (k + 1 < s.length && s(k) == l && s(k + 1) == r) {
          b += (l + r); k += 2
        } else { b += s(k); k += 1 }
      }
      b.result()
    }.size === 1)

    val peakState = q.recentProgress
      .map(_.stateOperators.map(_.numRowsTotal).sum).foldLeft(0L)(math.max)
    assert(peakState === 0L,
      s"applyBpeBytes must never store state, saw $peakState rows")
  }
}
