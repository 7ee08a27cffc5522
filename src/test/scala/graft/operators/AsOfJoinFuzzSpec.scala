package graft.operators

import scala.util.Random

import graft.SparkTestBase

/** Seeded random fuzz: the union + ignore-nulls-window as-of join must
  * agree with a brute-force per-key reference on every generated case,
  * including duplicate timestamps, keys missing on either side, and null
  * right values. */
class AsOfJoinFuzzSpec extends SparkTestBase {
  import spark.implicits._

  test("asofLeft matches brute force on 500 random rows (seed 42)") {
    val rnd = new Random(42)
    val leftRows = (1L to 200L).map(id =>
      (id, s"k${rnd.nextInt(12)}", rnd.nextInt(100).toLong))
    val rightRows = (1L to 300L).map(id =>
      (s"k${rnd.nextInt(15)}", rnd.nextInt(100).toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextDouble())))

    // one row per (key, ts): keep the last-generated (max index) like
    // latestPerKeyTs with a sequence tiebreaker
    val dedupedRight = rightRows.zipWithIndex
      .groupBy { case ((k, t, _), _) => (k, t) }
      .map { case (_, vs) => vs.maxBy(_._2)._1 }
      .toSeq

    val left = leftRows.toDF("id", "key", "t")
    val right = dedupedRight.toDF("key", "t", "v")

    val got = AsOfJoin.asofLeft(left, right, "key", "t", "v", "asof_v")
      .collect()
      .map(r => r.getAs[Long]("id") ->
        (if (r.isNullAt(r.fieldIndex("asof_v"))) None
         else Some(r.getAs[Double]("asof_v")))).toMap

    val byKey = dedupedRight.groupBy(_._1)
    leftRows.foreach { case (id, k, t) =>
      val expected = byKey.getOrElse(k, Seq.empty)
        .filter(_._2 <= t)
        .sortBy(_._2)
        .lastOption
        .flatMap(_._3)
      assert(got(id) === expected, s"id=$id key=$k t=$t")
    }
    assert(got.size === leftRows.size)
  }
}
