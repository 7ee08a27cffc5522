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
      names.map(_ -> 0.27), """{}""", "/root/testdata/sf0.1",
      """"canary":{"start":0.012,"end":0.014},""")
    assert(line.length <= Bench.MaxLine, s"len ${line.length}")
    // the canary stamp must survive every rung — it is how a reader of
    // the record alone tells a contended session from a regression
    assert(line.contains(""""canary":{"start":0.012,"end":0.014}"""))
    assert(line.startsWith("""{"metric":"total","value":"""))
    // whichever rung fired, the dict must be present and non-empty
    assert(line.contains(""""queries":{""") && !line.contains(""""queries":{}"""))
    // a stripped line must self-describe its key prefix
    if (note.isDefined) assert(line.contains(""""queries_key_prefix":"q_""""))
  }

  test("the contended stamp survives every ladder rung") {
    // main splices the stamp into the canary segment; whatever rung
    // fires, a contended record must SAY so on the one machine-read line
    val stamp = """"canary":{"start":0.012,"end":1.4},"contended":true,"""
    Seq(10, 102, 400).foreach { n =>
      val (line, _) = Bench.stdoutLine(suite(n), "{}", "sf", stamp)
      assert(line.length <= Bench.MaxLine, s"n=$n len=${line.length}")
      assert(line.contains(""""contended":true"""), s"n=$n")
    }
  }

  test("every rung of the ladder stays inside the tail budget") {
    // grow the suite until even the dict-less envelope is the only fit;
    // the line must NEVER exceed the budget at any size
    Seq(10, 50, 88, 120, 200, 400).foreach { n =>
      val (line, _) = Bench.stdoutLine(suite(n), "{}", "/root/testdata/sf0.1",
        """"canary":{"start":0.012,"end":0.014},""")
      assert(line.length <= Bench.MaxLine, s"n=$n len=${line.length}")
      assert(line.startsWith("""{"metric":"total","value":"""))
    }
  }

  test("the budget leaves real slack inside the consumer's 2000-char tail") {
    // the r8 record fit the old 1900 budget and STILL lost its head:
    // ~140 chars of trailing output (sidecar stderr line + sbt trailer)
    // shared the tail window. The budget itself must price that in.
    assert(Bench.MaxLine <= 1600)
  }

  test("a small suite reports full names with no degradation note") {
    val (line, note) = Bench.stdoutLine(
      Seq("q_topk" -> 0.4, "q_dedup_exact" -> 0.305), "{}", "sf")
    assert(note.isEmpty)
    assert(line.contains(""""q_topk":0.4"""))
    assert(line.contains(""""q_dedup_exact":0.31""")) // centi, trailing trim
    assert(!line.contains("queries_key_prefix"))
  }

  test("degraded rungs carry the sidecar pointer; 120+ queries still fit") {
    // once the full-name and stripped-name rungs no longer fit, the line
    // must point at the committed full-precision record
    Seq(120, 200, 400).foreach { n =>
      val (line, note) = Bench.stdoutLine(suite(n), "{}", "sf")
      assert(line.length <= Bench.MaxLine, s"n=$n len=${line.length}")
      assert(note.isDefined)
      if (!line.contains(""""queries_key_prefix"""") ||
          line.contains(""""queries_top"""") || line.contains(""""queries":{}"""))
        assert(line.contains(""""queries_file":"tools/bench_last.json""""),
          s"n=$n missing sidecar pointer: $line")
    }
  }

  private def parse(json: String) =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)

  test("sidecar record is valid JSON carrying both passes, escalations, errors") {
    val warm = Seq(("q_a", 0.1234567, None), ("q_b", 2.0, None),
      ("q_c", 0.5, Some("warm: Boom")))
    val timed = Seq(
      ("q_a", 0.111, None, None),
      ("q_b", 2.05, None, Some((2.0, Seq(9.7, 4.3, 2.1)))),
      ("q_c", 0.01, Some("Boom: \"quoted\"\nnewline"), None))
    val json = Bench.sidecarJson("/root/testdata/sf0.1", warm, timed,
      Map("q_c" -> "Boom: \"quoted\"\nnewline"), 0.011, 0.0136,
      contended = true)
    val node = parse(json)
    assert(node.get("suite_size").asInt == 3)
    assert(node.get("contended").asBoolean)
    // ms precision survives (the stdout line would have quantized this)
    assert(node.get("warm_sec").get("q_a").asDouble == 0.123)
    assert(node.get("timed_sec").get("q_b").asDouble == 2.05)
    assert(!node.get("timed_sec").has("q_c")) // failed query: no timing
    // the FULL raw sample ladder survives — a reported value whose raw
    // measurements are lost is unfalsifiable in the next round's forensics
    val r = node.get("outlier_escalations").get("q_b")
    assert(r.get("warm").asDouble == 2.0)
    assert(r.get("samples").size == 3 && r.get("samples").get(0).asDouble == 9.7)
    assert(r.get("reported").asDouble == 2.05)
    assert(node.get("canary_sec").get("start").asDouble == 0.011)
    assert(node.get("canary_sec").get("end").asDouble == 0.014)
    assert(node.get("errors").get("q_c").asText.contains("quoted"))
    assert(node.get("total_sec").asDouble == 2.161) // ms-rounded 0.111+2.05
  }

  test("escalation must not report the r8 contaminated median") {
    // the exact r8 failure: q_dedup_minhash_lsh warm 1.45 / timed 7.68 /
    // retry 4.17 — median-of-three reported the contaminated 4.17. Two
    // defenses, both pinned here. First: 4.17 still trips the trigger vs
    // warm, so the escalation loop in main KEEPS measuring instead of
    // reporting it.
    assert(Bench.retryTrigger(warm = 1.45, timed = 4.17))
    // Second: the pool-minimum rule never lands on a contaminated sample
    assert(Bench.reportFromSamples(1.45, Seq(7.68, 4.17, 1.52)) == 1.45)
    assert(Bench.reportFromSamples(1.45, Seq(7.68, 4.17)) == 1.45)
  }

  test("escalation must not report the r9 agreeing-contaminated cluster") {
    // the exact r9 failure: in a persistently contended session all FOUR
    // timed samples agreed with each other (warm 0.163, samples
    // 1.65/1.69/1.90/2.03) and the fastest-agreeing-pair rule reported
    // the contaminated 1.67 — the cluster outvoted the lone clean warm.
    // Within a session code and data are fixed: the warm pass PROVED the
    // query runs at 0.163, so the report must be ≤0.2, never 1.67.
    val rep = Bench.reportFromSamples(0.163, Seq(1.65, 1.69, 1.90, 2.03))
    assert(rep <= 0.2, s"reported $rep")
    assert(rep == 0.163)
  }

  test("a real regression reports honestly: its warm pass is slow too") {
    // the pool minimum cannot hide a REAL slowdown, because a genuine
    // regression is in the code: the same-session warm pass already runs
    // slow, and the minimum of an all-slow pool is the slow steady state
    assert(Bench.reportFromSamples(7.4, Seq(7.7, 7.5)) == 7.4)
    // an untripped timed pass never reaches reportFromSamples, but the
    // degenerate one-sample ladder must still behave
    assert(Bench.reportFromSamples(2.0, Seq(2.2)) == 2.0)
  }

  test("contended stamp fires on session-wide inflation, not jitter") {
    // >5 queries with timed >1.5× warm (and >50ms absolute) = contended
    val inflated = Seq.fill(6)((0.3, 0.9))
    assert(Bench.contendedStamp(inflated ++ Seq.fill(90)((0.3, 0.31))))
    // exactly 5 is below the threshold
    assert(!Bench.contendedStamp(inflated.take(5) ++ Seq.fill(90)((0.3, 0.31))))
    // ratio trips on ~30ms queries are pure timer jitter: absolute floor
    assert(!Bench.contendedStamp(Seq.fill(20)((0.03, 0.06))))
    // a clean suite never stamps
    assert(!Bench.contendedStamp(Seq.fill(100)((0.5, 0.52))))
  }

  test("a lone surrogate in an error message still yields parseable JSON") {
    // e.take(60) can split an astral pair; JsonUtil must \u-escape the
    // orphan half so the one machine-parsed line stays valid JSON
    val lone = "failed at \ud83d" // high surrogate with no low half
    val quoted = JsonUtil.quote(lone)
    assert(quoted.contains("\\ud83d"))
    assert(parse(s"""{"e":$quoted}""").get("e") != null)
    // a WELL-FORMED pair must survive escaping as the same astral char
    assert(parse(s"""{"e":${JsonUtil.quote("ok 😀")}}""")
      .get("e").asText == "ok 😀")
  }

  test("outlier-retry trigger fires on both the ratio and absolute shapes") {
    // ratio shape (r4: 11.08s vs 1.7s warm)
    assert(Bench.retryTrigger(warm = 1.7, timed = 11.08))
    // absolute shape (r7: q_dedup_simhash timed 4.61s vs warm 2.60s slipped
    // the ratio trigger — 4.61 < 2×2.60 — and a 2s discrepancy shipped
    // unexplained; the widened trigger must catch exactly this)
    assert(Bench.retryTrigger(warm = 2.60, timed = 4.61))
    // short-query ratio shape (r9: q_derive_dates timed 1.22s vs warm
    // 0.27s — 4.5× inflated, yet gap 0.95s slipped both the 1.0s and
    // 1.5s absolute gates and the record shipped it with no ladder)
    assert(Bench.retryTrigger(warm = 0.27, timed = 1.22))
    // the r9 q_doc_lang_stats shape (warm 0.163 → 1.65) fires too
    assert(Bench.retryTrigger(warm = 0.163, timed = 1.65))
    // non-firing neighborhoods: normal agreement, sub-300ms multiplicative
    // jitter, and a gap under the 1.5s absolute threshold
    assert(!Bench.retryTrigger(warm = 2.60, timed = 2.80))
    assert(!Bench.retryTrigger(warm = 0.10, timed = 0.38))
    assert(!Bench.retryTrigger(warm = 3.00, timed = 4.40))
    // boundary: just past the absolute threshold fires even at low ratio
    assert(Bench.retryTrigger(warm = 10.0, timed = 11.51))
    // the absolute threshold scales with warm: 5% drift on a long query
    // is scheduler noise, not an anomaly — a fixed 1.5s gate would
    // re-measure every long query every round (r8 ADVICE)
    assert(!Bench.retryTrigger(warm = 40.0, timed = 42.0))
    // but a >10%-of-warm gap on the same long query still fires
    assert(Bench.retryTrigger(warm = 40.0, timed = 44.5))
    // a fast timed pass never retries, no matter how slow the warm was
    assert(!Bench.retryTrigger(warm = 30.0, timed = 1.9))
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

  test("canary drift stamps the cross-session ratio and flags the " +
      "measured contention window, not quiet-band variance") {
    // the late-r10 window: current canary min 0.346 vs the quiet-band
    // sidecar's 0.058 — ~6×, must flag (the within-session contended
    // stamp was silent here: warm and timed inflated together)
    val windowJson = Bench.canaryDriftJson(0.346, Some(0.058))
    assert(windowJson.contains(""""canary_vs_prev":5.97"""), windowJson)
    assert(windowJson.contains(""""canary_inflated":true"""), windowJson)
    // quiet-band session-to-session variance (0.058 vs 0.118, ~2×)
    // stamps the ratio but must NOT flag
    val quietJson = Bench.canaryDriftJson(0.118, Some(0.058))
    assert(quietJson.contains(""""canary_vs_prev":2.03"""), quietJson)
    assert(!quietJson.contains("canary_inflated"), quietJson)
    // a cleaner-than-baseline session is never flagged
    val cleaner = Bench.canaryDriftJson(0.058, Some(0.346))
    assert(cleaner.contains(""""canary_vs_prev":0.17"""), cleaner)
    assert(!cleaner.contains("canary_inflated"), cleaner)
    // no baseline / sentinel baselines degrade to an empty fragment
    assert(Bench.canaryDriftJson(0.346, None) === "")
    assert(Bench.canaryDriftJson(-1.0, Some(0.058)) === "")
  }

  test("official drift stamps ratio AND basis path; degrades without " +
      "either") {
    // the r17 adjudication numbers: this session's canary min 0.078 vs
    // the r16 official record's 0.051 — the 1.53x that actually carried
    // the round-over-round verdict, which canary_vs_prev (stamped 0.77
    // against an uncommitted intermediate run) could not
    val j = Bench.officialDriftJson(0.078, Some(0.051),
      Some("tools/bench_r16_final2.json"))
    assert(j.contains(""""canary_vs_official":1.53"""), j)
    assert(j.contains(
      """"official_record":"tools/bench_r16_final2.json""""), j)
    // no official baseline, no canary, or no path -> empty fragment,
    // never a failure
    assert(Bench.officialDriftJson(0.078, None, Some("x.json")) === "")
    assert(Bench.officialDriftJson(0.078, Some(0.051), None) === "")
    assert(Bench.officialDriftJson(-1.0, Some(0.051), Some("x")) === "")
  }

  test("sidecar carries the query_inflated_official dict") {
    val rendered = Bench.sidecarJson("sf", Seq(("q_a", 0.2, None)),
      Seq(("q_a", 5.0, None, None)), Map.empty, 0.1, 0.1,
      contended = false, driftJson = "",
      inflated = Nil, inflatedOfficial = Seq(("q_a", 1.97, 5.0)))
    assert(rendered.contains(""""query_inflated_official""""), rendered)
    assert(rendered.contains(""""official": 1.970"""), rendered)
    assert(rendered.contains(""""reported": 5.000"""), rendered)
  }

  test("prevCanaryMin parses the committed sidecar shape and degrades " +
      "on absence, corruption, and sentinels") {
    val dir = java.nio.file.Files.createTempDirectory("canary_prev")
    def write(name: String, body: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      p.toString
    }
    // the exact sidecarJson rendering round-trips
    val rendered = Bench.sidecarJson("sf", Seq(("q_a", 0.2, None)),
      Seq(("q_a", 0.1, None, None)), Map.empty, 0.346, 0.506)
    assert(Bench.prevCanaryMin(write("real.json", rendered))
      === Some(0.346))
    // min of the two bookends, either order
    assert(Bench.prevCanaryMin(write("m.json",
      """{"canary_sec": {"start": 0.118, "end": 0.058},""")) === Some(0.058))
    // -1 sentinels (canary never ran) are not a baseline
    assert(Bench.prevCanaryMin(write("s.json",
      """{"canary_sec": {"start": -1.000, "end": -1.000},""")) === None)
    // absent file / no canary field / garbage all degrade quietly
    assert(Bench.prevCanaryMin(dir.resolve("nope.json").toString) === None)
    assert(Bench.prevCanaryMin(write("e.json", """{"total_sec": 3}""")) === None)
    assert(Bench.prevCanaryMin(write("g.json", "not json at all")) === None)
  }

  test("sidecarTrigger fires on the r10 containment shape and respects " +
      "the noise-scale floor") {
    // the exact r10 blind spot: warm 7.77 / timed 6.96 / clean twin 1.97
    // — timed < warm, so no within-session rung could fire; the
    // cross-session rung must
    assert(!Bench.retryTrigger(warm = 7.77, timed = 6.96))
    assert(Bench.sidecarTrigger(prev = Some(1.97), timed = 6.96))
    // the three immaterial r10 >2x entries were sub-0.5s noise-scale
    // (q_doc_mixture_temp 0.45 vs ~0.18): below the absolute floor
    assert(!Bench.sidecarTrigger(prev = Some(0.18), timed = 0.45))
    // 2x is a ratio gate, not a drift gate: a 1.5x change on a long
    // query is a regression for the round-over-round diff, not a flag
    assert(!Bench.sidecarTrigger(prev = Some(10.0), timed = 15.0))
    // no previous record -> no twin -> never fires
    assert(!Bench.sidecarTrigger(prev = None, timed = 100.0))
  }

  test("tailRecoverNeeded fires on either committed twin and never " +
      "without one — the suite-end recovery pass the r17 record needed") {
    // the BENCH_r17 shape: q_dedup_minhash_sql reported 9.15 against a
    // clean official twin of 1.41 (6.5x, from a mid-run contention
    // window) — recovery must fire off the OFFICIAL twin even when the
    // local sidecar has no baseline, and vice versa
    assert(Bench.tailRecoverNeeded(None, Some(1.41), 9.15))
    assert(Bench.tailRecoverNeeded(Some(1.41), None, 9.15))
    // either twin clearing the entry (a re-sample landing inside the
    // band) ends the loop only when BOTH arms are quiet
    assert(Bench.tailRecoverNeeded(Some(1.41), Some(9.0), 9.15) ===
      Bench.sidecarTrigger(Some(1.41), 9.15))
    assert(!Bench.tailRecoverNeeded(Some(8.9), Some(9.0), 9.15))
    // no baseline on either side: nothing to recover against
    assert(!Bench.tailRecoverNeeded(None, None, 100.0))
    // noise-scale floor carries over from sidecarTrigger
    assert(!Bench.tailRecoverNeeded(Some(0.18), Some(0.2), 0.45))
  }

  test("prevTimedSec round-trips the sidecar shape and degrades quietly") {
    val dir = java.nio.file.Files.createTempDirectory("timed_prev")
    def write(name: String, body: String): String = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p,
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      p.toString
    }
    val rendered = Bench.sidecarJson("/data/sf0.1",
      Seq(("q_a", 0.2, None), ("q_b", 3.0, None)),
      Seq(("q_a", 0.111, None, None), ("q_b", 2.05, None, None)),
      Map.empty, 0.01, 0.01)
    val (sf, timed) = Bench.prevTimedSec(write("real.json", rendered))
    assert(sf === Some("/data/sf0.1"))
    // reads the TIMED block, not warm_sec (0.2/3.0)
    assert(timed === Map("q_a" -> 0.111, "q_b" -> 2.05))
    // absent / corrupt files yield no twins rather than failing the bench
    assert(Bench.prevTimedSec(dir.resolve("nope.json").toString)
      === ((None, Map.empty)))
    assert(Bench.prevTimedSec(write("g.json", "not json"))
      === ((None, Map.empty)))
  }

  test("sidecarJson and the stdout fragment carry the query_inflated " +
      "verdicts") {
    val json = Bench.sidecarJson("sf", Seq(("q_x", 7.77, None)),
      Seq(("q_x", 6.96, None, None)), Map.empty, 0.01, 0.01,
      contended = false, driftJson = "",
      inflated = Seq(("q_x", 1.97, 6.96)))
    val node = parse(json)
    val fl = node.get("query_inflated").get("q_x")
    assert(fl.get("prev").asDouble == 1.97)
    assert(fl.get("reported").asDouble == 6.96)
    // an uninflated record renders an empty dict, still valid JSON
    val clean = parse(Bench.sidecarJson("sf", Seq(("q_x", 1.0, None)),
      Seq(("q_x", 1.0, None, None)), Map.empty))
    assert(clean.get("query_inflated").size == 0)
  }
}
