package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench stdout contract: ONE JSON line the driver tail-parses. The
  * tail window is ~2000 chars — a longer line loses its head (the
  * headline total) and the round's record shows `parsed: null` (round
  * 5 died exactly that way). These tests pin the degradation ladder so
  * suite growth can never silently break the line again. No Spark
  * session needed: stdoutLine is pure. */
class BenchLineSpec extends AnyFunSuite {

  private def suite(n: Int, nameLen: Int = 18): Seq[(String, Double)] =
    (1 to n).map(i => (s"q_${"x" * (nameLen - 2)}$i", i * 0.037))

  test("the current-size suite always emits a non-empty per-query dict") {
    // the real query inventory, realistic timings: whatever rung fires,
    // the line must carry per-query data and stay parseable
    val names = SparkEntry.queries.keys.toSeq.sorted
    val (line, note) = Bench.stdoutLine(
      names.map(_ -> 0.27), """{}""", "/root/testdata/sf0.1")
    assert(line.length <= 1900, s"len ${line.length}")
    assert(line.startsWith("""{"metric":"total","value":"""))
    // whichever rung fired, the dict must be present and non-empty
    assert(line.contains(""""queries":{""") && !line.contains(""""queries":{}"""))
    // a stripped line must self-describe its key prefix
    if (note.isDefined) assert(line.contains(""""queries_key_prefix":"q_""""))
  }

  test("every rung of the ladder stays inside the tail budget") {
    // grow the suite until even the dict-less envelope is the only fit;
    // the line must NEVER exceed the budget at any size
    Seq(10, 50, 88, 120, 200, 400).foreach { n =>
      val (line, _) = Bench.stdoutLine(suite(n), "{}", "/root/testdata/sf0.1")
      assert(line.length <= 1900, s"n=$n len=${line.length}")
      assert(line.startsWith("""{"metric":"total","value":"""))
    }
  }

  test("a small suite reports full names with no degradation note") {
    val (line, note) = Bench.stdoutLine(
      Seq("q_topk" -> 0.4, "q_dedup_exact" -> 0.305), "{}", "sf")
    assert(note.isEmpty)
    assert(line.contains(""""q_topk":0.4"""))
    assert(line.contains(""""q_dedup_exact":0.31""")) // centi, trailing trim
    assert(!line.contains("queries_key_prefix"))
  }

  test("locale independence: values always use a dot decimal separator") {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try {
      val (line, _) = Bench.stdoutLine(Seq("q_a" -> 1.25), "{}", "sf")
      assert(line.contains(""""q_a":1.25"""), line)
      assert(!line.contains("1,25"))
    } finally java.util.Locale.setDefault(prev)
  }
}
