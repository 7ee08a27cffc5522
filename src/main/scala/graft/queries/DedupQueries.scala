package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Clean, Tables}

/** Deduplication operators for a training-data pipeline, over `documents`
  * (exact, n-gram Jaccard, MinHash-LSH, SimHash) and `embeddings`
  * (cosine near-duplicate). See also [[SimilarityQueries]] for ANN search.
  *
  * Scale design (100 TB):
  *  - signatures (fingerprint / minhash / simhash) are pure per-row
  *    expression work — no shuffle, stays in whole-stage codegen;
  *  - candidate generation always goes through a bucket key (hash, LSH
  *    band, simhash band) so the only shuffles are hash-partitions on
  *    bucket keys and pair-joins happen within buckets — never an
  *    all-pairs cross join;
  *  - worst-case bucket skew is bounded by construction (band width);
  *    a salted re-bucket would slot in at the exchange if a hostile
  *    corpus concentrated one band value.
  */
object DedupQueries {

  /** Whitespace tokens of normalized text. */
  private def toks(text: Column): Column =
    split(regexp_replace(lower(trim(text)), "\\s+", " "), " ")

  /** Word w-shingles as space-joined strings, distinct. `t` MUST be a bound
    * column (not an expression tree): `element_at` inside the lambda repeats
    * its argument per element, so passing the tokenizer expression directly
    * would re-run regexp+split per shingle (~10x query cost, measured). */
  private def shinglesOf(t: Column, w: Int): Column =
    array_distinct(
      when(size(t) >= w,
        transform(sequence(lit(0), size(t) - w),
          i => concat_ws(" ", (0 until w).map(o => element_at(t, i + o + 1)): _*)))
        .otherwise(array(concat_ws(" ", t))))

  /** documents -> (doc_id, lang, grams) with tokens materialized first.
    * The input is repartitioned on doc_id before the (interpreted,
    * per-row expensive) shingle lambda: the testdata arrives as a single
    * parquet split, and a 100 TB corpus wants the signature work spread
    * over every core regardless of input file layout. */
  private def withShingles(df: DataFrame, w: Int): DataFrame =
    df.repartition(col("doc_id"))
      .withColumn("__toks", toks(col("text")))
      .withColumn("grams", shinglesOf(col("__toks"), w))
      .drop("__toks")

  // NOTE on formulation: higher-order functions (transform/aggregate) are
  // interpreted, not codegen'd — a nested seeds×shingles lambda costs ~70µs
  // per element and took minutes at sf0.1. The signature computations below
  // therefore explode once and use plain codegen'd hash/agg expressions:
  // same results, one narrow shuffle on doc_id, orders of magnitude faster,
  // and the shape that actually scales on a cluster.

  /** MinHash-LSH banded candidate pairs over (doc_id, text): shingles are
    * exploded once, k=bands*rows seeded hashes with codegen'd
    * min-aggregates form the signature, and docs sharing >=1 band bucket
    * become (doc_a, doc_b, shared_bands) pairs — an equi-join on
    * (band_idx, band_hash), never an all-pairs pass.
    * explode_outer for the same InferFiltersFromGenerate reason as in
    * q_dedup_ngram_jaccard. */
  private def minhashLshPairs(docs: DataFrame, bands: Int = 8,
      rows: Int = 4): DataFrame =
    minhashLshPairsFromShingled(withShingles(docs, 3), bands, rows)

  /** LSH pairs over an already-shingled (doc_id, grams) frame — callers
    * that also need the gram arrays for verification (q_dedup_clusters)
    * pass the SAME frame to both consumers so the exchange below it is
    * computed once (ReuseExchange), instead of paying the interpreted
    * shingle lambda once per plan branch. */
  private def minhashLshPairsFromShingled(shingled: DataFrame,
      bands: Int = 8, rows: Int = 4): DataFrame = {
    import shingled.sparkSession.implicits._
    val k = bands * rows
    val exploded = shingled
      .select($"doc_id", explode_outer($"grams").as("shingle"))
    val sig = exploded
      .groupBy($"doc_id")
      .agg(min(xxhash64(lit(0), $"shingle")).as("m0"),
        (1 until k).map(i => min(xxhash64(lit(i), $"shingle")).as(s"m$i")): _*)
    val banded = sig.select($"doc_id", posexplode(array(
      (0 until bands).map(bnd =>
        xxhash64((bnd * rows until (bnd + 1) * rows).map(i => col(s"m$i")): _*)): _*)))
      .toDF("doc_id", "band_idx", "band_hash")
    val x = banded.select($"doc_id".as("doc_a"), $"band_idx", $"band_hash")
    val y = banded.select($"doc_id".as("doc_b"), $"band_idx", $"band_hash")
    x.join(y, Seq("band_idx", "band_hash"))
      .filter($"doc_a" < $"doc_b")
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("shared_bands"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on a content fingerprint; keep min doc_id.
    "q_dedup_exact" -> ((s, dir) => {
      import s.implicits._
      Tables.table(s, dir, "documents")
        .select($"doc_id",
          md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("fingerprint"))
        .groupBy($"fingerprint")
        .agg(min($"doc_id").as("keep_doc_id"),
          count(lit(1)).as("copy_count"))
        .orderBy("keep_doc_id")
    }),

    // N-gram Jaccard near-dup: candidates bucketed by (lang, length band);
    // |A∩B| via an inverted-index join on individual grams (codegen'd
    // hash join + count, no per-pair array intersection), then
    // jaccard = c / (|A| + |B| - c).
    //
    // Exact duplicates are collapsed FIRST: verbatim copies multiply
    // candidate pairs quadratically inside each block (ScaleProbe measured
    // 3.7x superlinear growth at 8x data on a copy-heavy corpus). Pair
    // logic runs once per (lang, fingerprint) representative; membership
    // fans verdicts back out at the end. Identical text means identical
    // grams, so every cross-group member pair inherits its
    // representatives' jaccard exactly, and within-group pairs are 1.0 by
    // construction — the output is row-for-row the same as the
    // uncollapsed all-pairs form (the DuckDB oracle still computes that).
    "q_dedup_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", $"lang", $"text",
          md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("fp"))
      val groups = docs.groupBy($"lang", $"fp").agg(min($"doc_id").as("rep_id"))
      val members = docs.select($"doc_id", $"lang", $"fp")
        .join(groups, Seq("lang", "fp"))
        .select($"rep_id", $"doc_id")
      val reps = docs.join(groups.select($"rep_id".as("doc_id")), Seq("doc_id"))
      val shingled = withShingles(reps, 3)
        .select($"doc_id", $"lang",
          (length($"text") / 64).cast("int").as("len_band"), $"grams")
      // explode_outer, not explode: InferFiltersFromGenerate would add a
      // size(grams)>0 filter that predicate pushdown re-expands into three
      // more per-row evaluations of the whole shingle expression (measured
      // ~8x query cost). shinglesOf never yields an empty array, so the
      // outer variant is semantically identical here.
      val inv = shingled.select($"doc_id", $"lang", $"len_band",
        explode_outer($"grams").as("gram"))
      // per-doc gram counts COUNTED from the index rather than size(grams):
      // a size() column in the join lineage lets the final threshold
      // filter's not-null constraint drag the whole shingle expression into
      // the scan filters via constraint propagation.
      val counts = inv.groupBy($"doc_id").agg(count(lit(1)).as("gram_count"))
      val a = inv.select($"doc_id".as("doc_a"), $"lang", $"len_band", $"gram")
      val b = inv.select($"doc_id".as("doc_b"), $"lang", $"len_band", $"gram")
      val repPairs = a.join(b, Seq("lang", "len_band", "gram"))
        .filter($"doc_a" < $"doc_b")
        .groupBy($"doc_a", $"doc_b")
        .agg(count(lit(1)).as("common"))
        // no broadcast hint: counts is O(#documents) — let AQE pick
        // (broadcast at toy scale, shuffle join on the pair keys at 100 TB)
        .join(counts.select($"doc_id".as("doc_a"),
          $"gram_count".as("count_a")), Seq("doc_a"))
        .join(counts.select($"doc_id".as("doc_b"),
          $"gram_count".as("count_b")), Seq("doc_b"))
        .select($"doc_a", $"doc_b",
          Clean.roundHalfUp($"common".cast("double")
            / ($"count_a" + $"count_b" - $"common"), 4).as("jaccard"))
        .filter($"jaccard" >= 0.2)
      // fan the representative verdicts back out to all member pairs
      val cross = repPairs
        .join(members.select($"rep_id".as("doc_a"), $"doc_id".as("mem_a")),
          Seq("doc_a"))
        .join(members.select($"rep_id".as("doc_b"), $"doc_id".as("mem_b")),
          Seq("doc_b"))
        .select(least($"mem_a", $"mem_b").as("doc_a"),
          greatest($"mem_a", $"mem_b").as("doc_b"), $"jaccard")
      val within = members.select($"rep_id", $"doc_id".as("doc_a"))
        .join(members.select($"rep_id", $"doc_id".as("doc_b")), Seq("rep_id"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b", lit(1.0).as("jaccard"))
      cross.union(within).orderBy("doc_a", "doc_b")
    }),

    // MinHash + LSH banding: signature k=32, 8 bands x 4 rows; docs
    // sharing >=1 band bucket become candidate pairs. (No SQL oracle —
    // seeded xxhash64 is not reproducible in DuckDB; correctness is
    // pinned by DedupSpec against brute-force Jaccard instead.)
    "q_dedup_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      minhashLshPairs(Tables.table(s, dir, "documents"))
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash: 64-bit signature from token hashes; near-dups = pairs
    // sharing a 16-bit band with Hamming distance <= 3. (No SQL oracle —
    // bit-level hashing; pinned by SimHashSpec.)
    "q_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      val bits = 64
      // bit i weight = +1 if hash bit set else -1; signature bit = sign of
      // the per-bit sum. Explode distinct tokens once; 64 codegen'd
      // conditional-sum aggregates (constant shift amounts) per doc.
      val tok = Tables.table(s, dir, "documents")
        .repartition($"doc_id")
        .select($"doc_id", explode_outer(array_distinct(toks($"text"))).as("t"))
        .select($"doc_id", xxhash64($"t").as("h"))
      val bitSums = tok.groupBy($"doc_id")
        .agg(sum(when(shiftright($"h", 0).bitwiseAND(1L) === 1L, 1L)
          .otherwise(-1L)).as("b0"),
          (1 until bits).map(i =>
            sum(when(shiftright($"h", i).bitwiseAND(1L) === 1L, 1L)
              .otherwise(-1L)).as(s"b$i")): _*)
      val sigs = bitSums.select($"doc_id",
        (0 until bits).map(i =>
          when(col(s"b$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
      val banded = sigs.select($"doc_id", $"simhash",
        posexplode(array((0 until 4).map(b =>
          shiftright($"simhash", b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
        .toDF("doc_id", "simhash", "band_idx", "band_val")
      val x = banded.select($"doc_id".as("doc_a"), $"simhash".as("sim_a"),
        $"band_idx", $"band_val")
      val y = banded.select($"doc_id".as("doc_b"), $"simhash".as("sim_b"),
        $"band_idx", $"band_val")
      x.join(y, Seq("band_idx", "band_val"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          call_function("bit_count", $"sim_a".bitwiseXOR($"sim_b")).as("hamming"))
        .distinct()
        .filter($"hamming" <= 3)
        .orderBy("doc_a", "doc_b")
    }),

    // Dedup clusters — the full production pipeline shape: exact
    // duplicates collapse to one representative per fingerprint group,
    // MinHash-LSH generates candidate pairs over representatives only,
    // ONLY candidates are verified with exact Jaccard (per-pair array
    // intersection over a handful of pairs, not a blocked all-pairs
    // pass), verified pairs form an undirected graph, connected
    // components (graft.operators.ConnectedComponents, min-label
    // propagation) label each representative, and members inherit their
    // representative's label. Identical texts produce identical MinHash
    // signatures, so the collapsed graph has exactly the same components
    // as the old rep+member graph while removing the quadratic
    // within-group candidate blowup. Rows-only: pinned by DedupSpec.
    "q_dedup_clusters" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", $"text",
          md5(regexp_replace(lower(trim($"text")), "\\s+", " ")).as("fp"))
      val groups = docs.groupBy($"fp").agg(min($"doc_id").as("rep_id"))
      val members = docs.select($"doc_id", $"fp")
        .join(groups, Seq("fp")).select($"rep_id", $"doc_id")
      val reps = docs.join(groups.select($"rep_id".as("doc_id")), Seq("doc_id"))
        .select($"doc_id", $"text")
      // Grams are computed BEFORE the repartition exchange (the upstream
      // rep-join already spread the rows), so the LSH-signature branch and
      // the verification branch below share one exchange subtree — Spark's
      // ReuseExchange materializes the interpreted shingle lambda once
      // instead of once per branch.
      val grams = reps
        .withColumn("__toks", toks($"text"))
        .select($"doc_id", shinglesOf($"__toks", 3).as("grams"))
        .repartition($"doc_id")
      val nearPairs = minhashLshPairsFromShingled(grams)
        .select($"doc_a", $"doc_b")
        .join(grams.select($"doc_id".as("doc_a"), $"grams".as("ga")), Seq("doc_a"))
        .join(grams.select($"doc_id".as("doc_b"), $"grams".as("gb")), Seq("doc_b"))
        .filter(size(array_intersect($"ga", $"gb")).cast("double")
          / size(array_union($"ga", $"gb")) >= 0.5)
        .select($"doc_a".as("src"), $"doc_b".as("dst"))
      val comp = graft.operators.ConnectedComponents.components(nearPairs)
      // a representative keeps its component's min id if it has near-dups,
      // else itself; members inherit their representative's keeper
      val repKeep = groups.select($"rep_id")
        .join(comp.withColumnRenamed("id", "rep_id"), Seq("rep_id"), "left")
        .select($"rep_id", coalesce($"component", $"rep_id").as("keep_doc_id"))
      members.join(repKeep, Seq("rep_id"))
        .select($"doc_id", $"keep_doc_id")
        .filter($"doc_id" =!= $"keep_doc_id")
        .orderBy("doc_id")
    }),

    // Clusters over the SQL-reproducible edge set (the q_dedup_ngram_jaccard
    // pairs — no seeded hashing anywhere), so the clustering pipeline also
    // gets a hard DuckDB oracle: a recursive-CTE transitive closure
    // computes the same min-id components.
    "q_dedup_clusters_sql" -> ((s, dir) => {
      import s.implicits._
      val pairs = queries("q_dedup_ngram_jaccard")(s, dir)
        .select($"doc_a".as("src"), $"doc_b".as("dst"))
      graft.operators.ConnectedComponents.components(pairs)
        .select($"id".as("doc_id"), $"component".as("keep_doc_id"))
        .filter($"doc_id" =!= $"keep_doc_id")
        .orderBy("doc_id")
    }),

    // Edit-distance near-dup: candidates blocked on (lang, 16-char
    // normalized prefix) — only same-prefix docs pay the O(len^2)
    // levenshtein DP, the textbook cost control for edit-distance dedup.
    "q_dedup_editdist" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", $"lang",
          regexp_replace(lower(trim($"text")), "\\s+", " ").as("norm"))
        .withColumn("prefix", substring($"norm", 1, 16))
      val a = docs.select($"doc_id".as("doc_a"), $"lang", $"prefix",
        $"norm".as("norm_a"))
      val b = docs.select($"doc_id".as("doc_b"), $"lang", $"prefix",
        $"norm".as("norm_b"))
      a.join(b, Seq("lang", "prefix"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          levenshtein($"norm_a", $"norm_b").as("edit_distance"),
          greatest(length($"norm_a"), length($"norm_b")).as("max_len"))
        .filter($"edit_distance" <= $"max_len" / 10)
        .orderBy("doc_a", "doc_b")
    }),

    // Embedding cosine near-dup: same-label blocking, pairwise cosine via
    // the codegen'd CosineSim expression (graft.functions), threshold.
    "q_dedup_embedding" -> ((s, dir) => {
      import s.implicits._
      graft.functions.VectorFunctions.register(s)
      val vecs = Tables.table(s, dir, "embeddings")
        .select($"vec_id", $"label", $"embedding".cast("array<double>").as("v"))
      val a = vecs.select($"vec_id".as("vec_a"), $"label", $"v".as("va"))
      val b = vecs.select($"vec_id".as("vec_b"), $"label", $"v".as("vb"))
      a.join(b, Seq("label"))
        .filter($"vec_a" < $"vec_b")
        .select($"vec_a", $"vec_b",
          Clean.roundHalfUp(
            graft.functions.VectorFunctions.cosineSim($"va", $"vb"), 4)
            .as("cosine"))
        .filter($"cosine" >= 0.8)
        .orderBy("vec_a", "vec_b")
    })
  )

  def oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT fingerprint, min(doc_id) AS keep_doc_id,
        |  CAST(count(*) AS BIGINT) AS copy_count
        |FROM (SELECT doc_id,
        |        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
        |          AS fingerprint
        |      FROM documents)
        |GROUP BY fingerprint ORDER BY keep_doc_id""".stripMargin,

    "q_dedup_ngram_jaccard" ->
      """WITH docs AS (
        |  SELECT doc_id, lang,
        |    CAST(length(text) // 64 AS INT) AS len_band,
        |    list_distinct(CASE WHEN length(toks) >= 3
        |      THEN list_transform(range(1, length(toks) - 1),
        |           i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS grams
        |  FROM (SELECT doc_id, lang, text,
        |          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
        |            AS toks
        |        FROM documents))
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  floor(CAST(length(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |        / (length(a.grams) + length(b.grams)
        |           - length(list_intersect(a.grams, b.grams)))
        |        * 10000 + 0.5) / 10000 AS jaccard
        |FROM docs a JOIN docs b
        |  ON a.lang = b.lang AND a.len_band = b.len_band AND a.doc_id < b.doc_id
        |WHERE floor(CAST(length(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |        / (length(a.grams) + length(b.grams)
        |           - length(list_intersect(a.grams, b.grams)))
        |        * 10000 + 0.5) / 10000 >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_clusters_sql" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, lang,
        |    CAST(length(text) // 64 AS INT) AS len_band,
        |    list_distinct(CASE WHEN length(toks) >= 3
        |      THEN list_transform(range(1, length(toks) - 1),
        |           i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))
        |      ELSE [array_to_string(toks, ' ')] END) AS grams
        |  FROM (SELECT doc_id, lang, text,
        |          string_split(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), ' ')
        |            AS toks
        |        FROM documents)),
        |pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM docs a JOIN docs b
        |    ON a.lang = b.lang AND a.len_band = b.len_band AND a.doc_id < b.doc_id
        |  WHERE floor(CAST(length(list_intersect(a.grams, b.grams)) AS DOUBLE)
        |          / (length(a.grams) + length(b.grams)
        |             - length(list_intersect(a.grams, b.grams)))
        |          * 10000 + 0.5) / 10000 >= 0.2),
        |edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM edges
        |  UNION
        |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        |SELECT doc_id, keep_doc_id FROM (
        |  SELECT src AS doc_id, least(src, min(dst)) AS keep_doc_id
        |  FROM reach GROUP BY src)
        |WHERE doc_id <> keep_doc_id ORDER BY doc_id""".stripMargin,

    "q_dedup_editdist" ->
      """WITH docs AS (
        |  SELECT doc_id, lang,
        |    regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        |  FROM documents),
        |pre AS (SELECT doc_id, lang, norm, substring(norm, 1, 16) AS prefix
        |        FROM docs)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.norm, b.norm) AS INT) AS edit_distance,
        |  CAST(greatest(length(a.norm), length(b.norm)) AS INT) AS max_len
        |FROM pre a JOIN pre b
        |  ON a.lang = b.lang AND a.prefix = b.prefix AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.norm, b.norm)
        |      <= greatest(length(a.norm), length(b.norm)) / 10
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q_dedup_embedding" ->
      """WITH vecs AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
        |                                 x -> x * x))) AS norm
        |  FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  floor(list_sum(list_transform(range(1, 65),
        |          i -> a.v[i] * b.v[i])) / (a.norm * b.norm)
        |        * 10000 + 0.5) / 10000 AS cosine
        |FROM vecs a JOIN vecs b ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE floor(list_sum(list_transform(range(1, 65),
        |          i -> a.v[i] * b.v[i])) / (a.norm * b.norm)
        |        * 10000 + 0.5) / 10000 >= 0.8
        |ORDER BY vec_a, vec_b""".stripMargin
  )
}
