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

  /** Word w-shingles as space-joined strings, distinct. */
  private def shingles(text: Column, w: Int): Column = {
    val t = toks(text)
    array_distinct(
      when(size(t) >= w,
        transform(sequence(lit(0), size(t) - w),
          i => concat_ws(" ", (0 until w).map(o => element_at(t, i + o + 1)): _*)))
        .otherwise(array(concat_ws(" ", t))))
  }

  /** MinHash signature: k independent permutations approximated by seeded
    * xxhash64; min over the doc's shingles per seed. Pure per-row compute. */
  private def minhashSig(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      seed => array_min(transform(sh, s => xxhash64(seed, s))))

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

    // N-gram Jaccard near-dup: candidates bucketed by (lang, length band),
    // then pairwise Jaccard over distinct word 3-grams within buckets.
    "q_dedup_ngram_jaccard" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.table(s, dir, "documents")
        .select($"doc_id", $"lang",
          (length($"text") / 64).cast("int").as("len_band"),
          shingles($"text", 3).as("grams"))
      val a = docs.select($"doc_id".as("doc_a"), $"lang", $"len_band",
        $"grams".as("grams_a"))
      val b = docs.select($"doc_id".as("doc_b"), $"lang", $"len_band",
        $"grams".as("grams_b"))
      a.join(b, Seq("lang", "len_band"))
        .filter($"doc_a" < $"doc_b")
        .select($"doc_a", $"doc_b",
          Clean.roundHalfUp(
            size(array_intersect($"grams_a", $"grams_b")).cast("double")
              / size(array_union($"grams_a", $"grams_b")), 4).as("jaccard"))
        .filter($"jaccard" >= 0.2)
        .orderBy("doc_a", "doc_b")
    }),

    // MinHash + LSH banding: signature k=32, 8 bands x 4 rows; docs
    // sharing >=1 band bucket become candidate pairs. (No SQL oracle —
    // seeded xxhash64 is not reproducible in DuckDB; correctness is
    // pinned by MinHashSpec against brute-force Jaccard instead.)
    "q_dedup_minhash_lsh" -> ((s, dir) => {
      import s.implicits._
      val bands = 8
      val rows = 4
      val sig = Tables.table(s, dir, "documents")
        .select($"doc_id", minhashSig(shingles($"text", 3), bands * rows).as("sig"))
      val banded = sig.select($"doc_id", posexplode(
        transform(sequence(lit(0), lit(bands - 1)),
          bnd => xxhash64(slice($"sig", bnd * rows + 1, lit(rows))))))
        .toDF("doc_id", "band_idx", "band_hash")
      val x = banded.select($"doc_id".as("doc_a"), $"band_idx", $"band_hash")
      val y = banded.select($"doc_id".as("doc_b"), $"band_idx", $"band_hash")
      x.join(y, Seq("band_idx", "band_hash"))
        .filter($"doc_a" < $"doc_b")
        .groupBy($"doc_a", $"doc_b")
        .agg(count(lit(1)).as("shared_bands"))
        .orderBy("doc_a", "doc_b")
    }),

    // SimHash: 64-bit signature from token hashes; near-dups = pairs
    // sharing a 16-bit band with Hamming distance <= 3. (No SQL oracle —
    // bit-level hashing; pinned by SimHashSpec.)
    "q_dedup_simhash" -> ((s, dir) => {
      import s.implicits._
      val bits = 64
      val tokenHashes = transform(array_distinct(toks($"text")), t => xxhash64(t))
      // bit i weight = +1 if hash bit set else -1; signature bit = sign of sum
      val simhash = aggregate(
        sequence(lit(0), lit(bits - 1)),
        lit(0L),
        (acc, i) => acc + when(
          aggregate(tokenHashes, lit(0L),
            (a, h) => a + when(
              call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1, 1L)
              .otherwise(-1L))
            > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L))
      val sigs = Tables.table(s, dir, "documents")
        .select($"doc_id", simhash.as("simhash"))
      val banded = sigs.select($"doc_id", $"simhash",
        posexplode(transform(sequence(lit(0), lit(3)),
          b => call_function("shiftright", $"simhash", b * 16)
            .bitwiseAND(lit(0xFFFFL)))))
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

    // Embedding cosine near-dup: same-label blocking, pairwise cosine in
    // double precision, threshold.
    "q_dedup_embedding" -> ((s, dir) => {
      import s.implicits._
      val vecs = Tables.table(s, dir, "embeddings")
        .select($"vec_id", $"label",
          transform($"embedding", x => x.cast("double")).as("v"))
      val withNorm = vecs.select($"vec_id", $"label", $"v",
        sqrt(aggregate($"v", lit(0.0), (a, x) => a + x * x)).as("norm"))
      val a = withNorm.select($"vec_id".as("vec_a"), $"label",
        $"v".as("va"), $"norm".as("na"))
      val b = withNorm.select($"vec_id".as("vec_b"), $"label",
        $"v".as("vb"), $"norm".as("nb"))
      a.join(b, Seq("label"))
        .filter($"vec_a" < $"vec_b")
        .select($"vec_a", $"vec_b",
          Clean.roundHalfUp(
            aggregate(zip_with($"va", $"vb", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
              / ($"na" * $"nb"), 4).as("cosine"))
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
