package graft.queries

import java.nio.file.Files
import java.security.MessageDigest

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** q_dedup_span beyond the oracle hash (which pins the exact manifest):
  * the C4-style span-removal semantics themselves — corpus-wide
  * first-occurrence-wins ordered by (doc_id, tile_index), WITHIN-doc
  * repeats removed too, exact token conservation, and the cleaned-doc
  * signature contract — plus a from-scratch JVM recomputation of the
  * whole pipeline on sf0.001 (tiling, winner selection, manifest),
  * independent of both Spark SQL and DuckDB. */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val W = 20

  /** Independent recomputation: plain Scala collections, no DataFrames. */
  private def recompute(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Long, Long, String)] = {
    case class Tile(doc: Long, idx: Int, toks: Int, hash: String)
    val tiles = docs
      .filter { case (_, t) => t != null && t.trim.nonEmpty }
      .flatMap { case (id, text) =>
        text.trim.split("\\s+").grouped(W).zipWithIndex.map {
          case (w, i) => Tile(id, i, w.length, md5hex(w.mkString(" ")))
        }
      }
    val first = tiles.groupBy(_.hash).map { case (h, ts) =>
      h -> ts.map(t => t.doc * 2147483648L + t.idx).min
    }
    tiles.groupBy(_.doc).map { case (d, ts) =>
      val kept = ts.filter(t => t.doc * 2147483648L + t.idx == first(t.hash))
      val removed = ts.filterNot(t =>
        t.doc * 2147483648L + t.idx == first(t.hash))
      (d, ts.size.toLong, kept.size.toLong, removed.size.toLong,
        kept.map(_.toks.toLong).sum, removed.map(_.toks.toLong).sum,
        md5hex(kept.sortBy(_.idx).map(_.hash).mkString(" ")))
    }.toSeq.sortBy(_._1)
  }

  private def run(dir: String) =
    graft.SparkEntry.queries("q_dedup_span")(spark, dir)
      .select($"doc_id", $"n_tiles", $"kept_tiles", $"removed_tiles",
        $"kept_tokens", $"removed_tokens", $"cleaned_sig")
      .as[(Long, Long, Long, Long, Long, Long, String)].collect().toSeq

  test("sf0.001 manifest equals a from-scratch JVM recomputation") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val want = recompute(docs)
    val got = run(sf0001)
    assert(got === want)
    assert(got.nonEmpty)
  }

  /** Fixture: A/B/C/D are disjoint 20-token tiles; doc 1 repeats doc 0
    * verbatim, doc 2 shares doc 0's head tile, doc 3 repeats its own
    * first tile within itself. */
  lazy val fixtureDir: String = {
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val a = toks("a", 20); val b = toks("b", 5)
    val c = toks("c", 10); val d = toks("d", 20)
    val dir = Files.createTempDirectory("span_fixture").toString
    Seq(
      (0L, s"$a $b", "en", "s0", 0L),    // tiles: A, B-tail — both novel
      (1L, s"$a $b", "en", "s1", 0L),    // exact copy: both removed
      (2L, s"$a $c", "en", "s2", 0L),    // A removed, C-tail kept
      (3L, s"$d $d", "en", "s3", 0L))    // within-doc repeat: 2nd D removed
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  test("first occurrence wins corpus-wide; verbatim copies empty out") {
    val m = run(fixtureDir).map(r => r._1 -> r).toMap
    // doc 0 keeps everything
    assert(m(0L)._3 == 2L && m(0L)._4 == 0L && m(0L)._5 == 25L)
    // doc 1 (verbatim copy) loses every tile; signature = md5 of ""
    assert(m(1L)._3 == 0L && m(1L)._4 == 2L && m(1L)._6 == 25L)
    assert(m(1L)._7 == md5hex(""))
    // doc 2 loses the shared head tile, keeps its novel tail
    assert(m(2L)._3 == 1L && m(2L)._4 == 1L && m(2L)._5 == 10L &&
      m(2L)._6 == 20L)
  }

  test("a tile repeated WITHIN one doc is removed (idx breaks the tie)") {
    val m = run(fixtureDir).map(r => r._1 -> r).toMap
    assert(m(3L)._2 == 2L && m(3L)._3 == 1L && m(3L)._4 == 1L)
    assert(m(3L)._5 == 20L && m(3L)._6 == 20L)
  }

  test("token mass is conserved per doc: kept + removed = doc tokens") {
    Seq(sf0001, fixtureDir).foreach { dir =>
      val docToks = spark.read.parquet(s"$dir/documents.parquet")
        .filter(org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.trim($"text")) > 0)
        .select($"doc_id",
          org.apache.spark.sql.functions.size(
            org.apache.spark.sql.functions.split(
              org.apache.spark.sql.functions.trim($"text"), "\\s+"))
            .cast("long").as("n"))
        .as[(Long, Long)].collect().toMap
      run(dir).foreach { r =>
        assert(r._5 + r._6 == docToks(r._1),
          s"doc ${r._1}: ${r._5}+${r._6} != ${docToks(r._1)}")
      }
    }
  }

  test("cleaned signature replays from the kept tiles") {
    // doc 2's kept content is its 10-token novel tail (one tile)
    def toks(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    val m = run(fixtureDir).map(r => r._1 -> r).toMap
    assert(m(2L)._7 == md5hex(md5hex(toks("c", 10))))
  }
}
