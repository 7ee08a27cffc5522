package graft.queries

import graft.SparkTestBase

/** q_shard_assign is a SHUFFLE, not just a partitioner — the properties
  * that make it one are balance (md5 keys spread uniformly over shards)
  * and locality destruction (adjacent doc_ids must NOT stay adjacent in
  * the training order — the affine sampleBucket device would fail this,
  * which is why the shuffle uses the md5 key). */
class ShardAssignSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val rows: Seq[(Long, Int, Int)] =
    graft.SparkEntry.queries("q_shard_assign")(spark, sf0001)
      .as[(Long, Int, Int)].collect().toSeq

  test("every document is assigned exactly once, positions are dense " +
      "per shard") {
    val n = rows.size
    assert(n > 0)
    assert(rows.map(_._1).distinct.size === n)
    rows.groupBy(_._2).foreach { case (_, shard) =>
      assert(shard.map(_._3).sorted === (1 to shard.size).toList)
    }
  }

  test("shards are balanced within 3x of uniform") {
    val sizes = rows.groupBy(_._2).values.map(_.size)
    assert(sizes.size === 16) // every shard populated at 500 docs
    val uniform = rows.size / 16.0
    assert(sizes.max < uniform * 3)
    assert(sizes.min > uniform / 3)
  }

  test("the shuffle destroys doc_id locality: consecutive doc_ids " +
      "rarely stay consecutive in shard order") {
    // position in the global (shard, pos) order per doc
    val order = rows.sortBy(r => (r._2, r._3)).map(_._1).zipWithIndex.toMap
    val ids = rows.map(_._1).sorted
    val adjacentStillAdjacent = ids.zip(ids.tail).count { case (a, b) =>
      math.abs(order(a) - order(b)) == 1
    }
    // under a real shuffle of n docs the chance a given adjacent pair
    // stays adjacent is ~2/n; allow a loose 2% of pairs before failing
    assert(adjacentStillAdjacent < ids.size * 0.02,
      s"$adjacentStillAdjacent of ${ids.size - 1} adjacent doc_id pairs " +
        "kept adjacent order — the shuffle key is preserving locality")
  }
}
