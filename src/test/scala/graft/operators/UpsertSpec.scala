package graft.operators

import graft.SparkTestBase

/** MERGE semantics: matched update, unmatched survive, insert, null-out,
  * last-writer-wins, tombstone delete, misaligned-schema rejection. */
class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def target = Seq(
    (1L, "alice", 10),
    (2L, "bob", 20),
    (3L, "carol", 30))
    .toDF("id", "name", "score")

  test("matched rows update, unmatched target rows survive, new keys insert") {
    val updates = Seq(
      (2L, "bobby", 25),   // update
      (4L, "dave", 40))    // insert
      .toDF("id", "name", "score")
    val out = Upsert.upsert(target, updates, Seq("id"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out === Seq(
      (1L, "alice", 10), (2L, "bobby", 25),
      (3L, "carol", 30), (4L, "dave", 40)))
  }

  test("an update can null a column out (matched marker, not value, decides)") {
    val updates = Seq((2L, Option.empty[String], Some(21)))
      .toDF("id", "name", "score")
    val out = Upsert.upsert(target, updates, Seq("id"))
      .as[(Long, Option[String], Option[Int])].collect().sortBy(_._1)
    assert(out(1) === ((2L, None, Some(21))))
    assert(out(0) === ((1L, Some("alice"), Some(10))))
  }

  test("last-writer-wins via versionCol") {
    val updates = Seq(
      (2L, "old", 1, 100L),
      (2L, "new", 2, 200L))
      .toDF("id", "name", "score", "version")
    val out = Upsert.upsert(target, updates, Seq("id"),
      versionCol = Some("version"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out(1) === ((2L, "new", 2)))
    assert(out.length === 3)
  }

  test("tombstone deletes the key") {
    val updates = Seq(
      (2L, "bob", 20, true),
      (4L, "dave", 40, false))
      .toDF("id", "name", "score", "is_deleted")
    val out = Upsert.upsert(target, updates, Seq("id"),
      deleteCol = Some("is_deleted"))
      .as[(Long, String, Int)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 3L, 4L))
  }

  test("version ties resolve by value hash, identically across runs") {
    val updates = Seq(
      (2L, "zed", 9, 100L),
      (2L, "amy", 7, 100L)) // same version: winner fixed by value hash
      .toDF("id", "name", "score", "version")
    val winners = (1 to 3).map { _ =>
      Upsert.upsert(target, updates.repartition(4), Seq("id"),
        versionCol = Some("version"))
        .as[(Long, String, Int)].collect().sortBy(_._1).apply(1)
    }
    assert(winners.distinct.length === 1)
  }

  test("tombstone named like a target column never deletes survivors") {
    // target carries its own soft-delete flag; a same-named deleteCol on
    // updates must only act on rows the UPDATE tombstones
    val t = Seq((1L, "alice", true), (2L, "bob", false))
      .toDF("id", "name", "is_deleted")
    val updates = Seq((2L, "bob", false, true))
      .toDF("id", "name", "is_deleted", "tomb")
      .select($"id", $"name", $"tomb".as("is_deleted"))
    // ambiguous shape on purpose: deleteCol IS a target data column
    val out = Upsert.upsert(t, updates, Seq("id"),
      deleteCol = Some("is_deleted"))
      .as[(Long, String, Boolean)].collect().sortBy(_._1)
    // row 1 (soft-flagged in TARGET, no update) survives; row 2 deleted
    assert(out.toSeq === Seq((1L, "alice", true)))
  }

  test("misaligned update schema is rejected eagerly") {
    val updates = Seq((2L, "bobby")).toDF("id", "name")
    val e = intercept[IllegalArgumentException] {
      Upsert.upsert(target, updates, Seq("id"))
    }
    assert(e.getMessage.contains("score"))
  }
}
