package graft.operators

import graft.SparkTestBase

/** Randomized witness for the clustering core behind q_dedup_clusters /
  * q_dedup_clusters_sql / q_dedup_editdist: on seeded random graphs —
  * sparse random pairs over a gappy id space, plus adversarial shapes
  * stitched in every iteration (a long chain, a star, an isolated pair,
  * self-loops) — iterative min-label propagation must equal a JVM
  * union-find, row for row. The recursive-CTE oracle pins clusters_sql on
  * the real corpus; this pins the operator itself on graph shapes the
  * corpus cannot guarantee to contain (deep chains exercise the
  * O(diameter) convergence bound, self-loops the symmetrize-distinct,
  * isolated pairs the neighborhood-min seeding). Fixed seed: failures
  * replay exactly.
  */
class ConnectedComponentsPropSpec extends SparkTestBase {
  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // roots are minimal by construction (we always parent the larger
    // root under the smaller), so find(x) IS the component min
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("seeded random graphs with chains, stars, self-loops, and " +
      "isolated pairs match a union-find reference") {
    val rnd = new scala.util.Random(42100813L)
    for (iter <- 1 to 6) {
      // gappy id space: random ids up to ~1e9 so component minima are
      // nothing like dense indices
      val n = 25 + rnd.nextInt(50)
      val ids = Seq.fill(n)(rnd.nextLong(1000000000L)).distinct
      def pick() = ids(rnd.nextInt(ids.size))
      val randomPairs = Seq.fill(ids.size + rnd.nextInt(ids.size)) {
        (pick(), pick()) // occasional self-loops arrive naturally
      }
      // adversarial shapes on fresh ids, one of each per iteration:
      // a chain deep enough to need real propagation rounds, a star,
      // an isolated pair, and an explicit self-loop singleton
      val baseId = 2000000000L + iter * 1000L
      val chain = (0 until (20 + rnd.nextInt(25)))
        .map(i => (baseId + i, baseId + i + 1))
      val starC = baseId + 500
      val star = (1 to 8).map(i => (starC + i, starC))
      val isolated = Seq((baseId + 600, baseId + 601))
      val selfLoop = Seq((baseId + 700, baseId + 700))
      val edges = rnd.shuffle(randomPairs ++ chain ++ star ++ isolated ++
        selfLoop)
      val got = ConnectedComponents
        .components(edges.toDF("src", "dst"), maxIter = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = unionFind(edges)
      assert(got === want, s"iter=$iter edges=${edges.take(40)}")
      // every node that appears in an edge is labeled, exactly once
      assert(got.keySet === edges.flatMap(e => Seq(e._1, e._2)).toSet)
    }
  }
}
