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

  /** 16-bit random-hyperplane signature: bit j = sign of <v, h_j> where
    * h_j[d] = ±1 from xxhash64(j, d) — pseudo-random, deterministic,
    * computed per-row with no shuffle. */
  private def rhpSignature(v: Column, bits: Int): Column =
    aggregate(
      sequence(lit(0), lit(bits - 1)),
      lit(0),
      (acc, j) => acc + when(
        aggregate(zip_with(v, sequence(lit(0), size(v) - 1),
            (x, d) => when(xxhash64(j, d).bitwiseAND(lit(1L)) === 1, x).otherwise(-x)),
          lit(0.0), (a, x) => a + x) > 0,
        call_function("shiftleft", lit(1), j)).otherwise(0))

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

    // LSH-bucketed ANN: probes join only candidates sharing their 16-bit
    // signature bucket (or differing in the lowest band) — the scale path.
    // No SQL oracle (seeded hash); AnnSpec measures recall vs q_knn_brute.
    "q_ann_lsh" -> ((s, dir) => {
      import s.implicits._
      VectorFunctions.register(s)
      val vecs = Tables.table(s, dir, "embeddings")
        .select($"vec_id", dvec($"embedding").as("v"))
        .withColumn("sig", rhpSignature($"v", 8))
      // multi-probe: explode each vector into its bucket plus the 8
      // single-bit-flip neighbors, so near-misses across one hyperplane
      // still collide with the probe's home bucket.
      val buckets = vecs.select($"vec_id", $"v",
        explode(array_union(array($"sig"),
          transform(sequence(lit(0), lit(7)),
            b => $"sig".bitwiseXOR(call_function("shiftleft", lit(1), b)))))
          .as("bucket"))
      val probes = vecs.filter($"vec_id" < 10)
        .select($"vec_id".as("query_id"), $"v".as("qv"), $"sig".as("bucket"))
      val cands = buckets.join(broadcast(probes), Seq("bucket"))
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
    })
  )

  def oracleSql: Map[String, String] = Map(
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
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  )
}
