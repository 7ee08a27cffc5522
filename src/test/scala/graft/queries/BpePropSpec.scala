package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.{SparkEntry, SparkTestBase}

/** Randomized equivalence witness for the BPE pair: on seeded random
  * corpora built to stress exactly what the paren-string machinery must
  * get right — a 2-letter alphabet (maximal pair collisions and
  * count TIES, so the (count DESC, lhs, rhs) tiebreak chain decides most
  * merges), nesting cascades (runs of one letter), a corpus whose merges
  * EXHAUST before the budget (every word collapsing to one symbol), and
  * degenerate rows (null text, empty text, paren words) — both
  * `q_doc_bpe_train` and `q_doc_bpe_apply` must equal the independent
  * symbol-vector reference (the same computation BpeSpec pins on its
  * hand-built fixture). Fixed seeds: failures replay exactly. */
class BpePropSpec extends SparkTestBase {
  import spark.implicits._

  private def write(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("bpe_prop").toString
    rows.map { case (id, t) =>
      (id, t, "en", s"src${id % 3}",
        Option(t).map(_.length.toLong).getOrElse(0L))
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    dir
  }

  // --- independent reference (symbol vectors + explicit merge scan) ---
  private def toks(t: String): Seq[String] =
    t.toLowerCase.replaceAll("^ +| +$", "").split("\\s+", -1).toSeq

  private def trainWords(rows: Seq[(Long, String)]): Map[String, Long] =
    rows.collect { case (_, t) if t != null => t }.flatMap(toks)
      .filter(w => w.length >= 2 && !w.exists(c => c == '(' || c == ')'))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  private def mergeScan(s: Vector[String], l: String, r: String)
      : Vector[String] = {
    val b = Vector.newBuilder[String]
    var k = 0
    while (k < s.length) {
      if (k + 1 < s.length && s(k) == l && s(k + 1) == r) {
        b += (l + r); k += 2
      } else { b += s(k); k += 1 }
    }
    b.result()
  }

  private def refBpe(words: Map[String, Long],
                     j: Int): Seq[(Int, String, String, Long)] = {
    var segs: Map[Vector[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var i = 1
    var stop = false
    while (i <= j && !stop) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      segs.foreach { case (s, c) =>
        s.iterator.zip(s.iterator.drop(1)).foreach(p => counts(p) += c)
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        out += ((i, l, r, c))
        segs = segs.map { case (s, c) => mergeScan(s, l, r) -> c }
        i += 1
      }
    }
    out.toSeq
  }

  private def refApply(w: String,
                       merges: Seq[(Int, String, String, Long)]): Long =
    if (w.exists(c => c == '(' || c == ')')) w.length.toLong
    else merges.foldLeft(w.map(_.toString).toVector) {
      case (s, (_, l, r, _)) => mergeScan(s, l, r)
    }.length.toLong

  private def check(rows: Seq[(Long, String)], tag: String): Unit = {
    val dir = write(rows)
    val merges = refBpe(trainWords(rows), 12)
    val gotTrain = SparkEntry.queries("q_doc_bpe_train")(spark, dir)
      .collect().toSeq
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(gotTrain === merges, s"[$tag] train mismatch")

    val expectApply = rows.map { case (id, t) =>
      if (t == null) (id, 0L, 0L, Option.empty[Double])
      else {
        val ws = toks(t)
        val bpe = ws.map(refApply(_, merges)).sum
        (id, ws.size.toLong, bpe,
          Some(math.floor(bpe.toDouble / ws.size * 10000 + 0.5) / 10000))
      }
    }.sortBy(_._1)
    val gotApply = SparkEntry.queries("q_doc_bpe_apply")(spark, dir)
      .collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(gotApply === expectApply, s"[$tag] apply mismatch")
  }

  test("tie-heavy 2-letter corpus (seed 41)") {
    val rnd = new scala.util.Random(41)
    val rows = (1L to 60L).map { id =>
      val w = () => (0 until 2 + rnd.nextInt(6))
        .map(_ => "ab" (rnd.nextInt(2))).mkString
      (id, (0 until 1 + rnd.nextInt(5)).map(_ => w()).mkString(" "))
    }
    check(rows, "ab")
  }

  test("nesting cascades + degenerates (seed 42)") {
    val rnd = new scala.util.Random(42)
    val rows: Seq[(Long, String)] = (1L to 40L).map { id =>
      val w = () =>
        if (rnd.nextBoolean()) "a" * (2 + rnd.nextInt(7)) // run: nest chain
        else (0 until 2 + rnd.nextInt(4))
          .map(_ => "abc" (rnd.nextInt(3))).mkString
      (id, (0 until 1 + rnd.nextInt(4)).map(_ => w()).mkString(" "))
    } ++ Seq((97L, null: String), (98L, ""), (99L, "(a)b a(b c)d"))
    check(rows, "nest")
  }

  test("merges exhaust before the budget (seed 43)") {
    // two distinct 2-char words only: merges 1-2 collapse both to single
    // symbols, then NO pair remains anywhere — both engines must stop
    val rows = (1L to 20L).map { id =>
      (id, if (id % 2 == 0) "ab ab" else "cd")
    }
    val merges = refBpe(trainWords(rows), 12)
    assert(merges.size == 2, s"fixture must exhaust, got $merges")
    check(rows, "exhaust")
  }
}
