package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.sources.SnapshotStore.ConcurrentCommitException

/** Multi-table snapshot transactions ([[SnapshotGroup]]) — the
  * cross-table all-or-nothing contract:
  *
  *  (a) a transaction advances BOTH member stores in one group
  *      publish; a reader that resolved the group before it sees the
  *      OLD version of every member after it;
  *  (b) 16 racing transactions admit exactly one (the group claim
  *      arbitrates before any member commit runs);
  *  (c) a transaction that dies mid-way leaves group readers
  *      atomically on the old state (the half-committed member
  *      version is invisible through the group), wedges the group
  *      loudly, and rollback removes the orphan member versions and
  *      releases the claim so a retry lands cleanly;
  *  (d) an out-of-band member commit is refused before any member
  *      commit runs.
  */
class SnapshotGroupSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  /** Two coupled stores — the worked example: postings + band index. */
  private def freshGroup(): (String, String, String) = {
    val dir = Files.createTempDirectory("snapgroup")
    val postings = dir.resolve("postings").toString
    val bands = dir.resolve("bands").toString
    SnapshotStore.init(spark, postings,
      Seq(("g1", 10L, 0), ("g2", 20L, 1), ("g3", 30L, 0))
        .toDF("g", "doc_id", "pt"), "pt")
    SnapshotStore.init(spark, bands,
      Seq(("b1", 10L, 0), ("b2", 20L, 1))
        .toDF("band", "doc_id", "pt"), "pt")
    val group = dir.resolve("group").toString
    SnapshotGroup.init(spark, group,
      Map("postings" -> postings, "bands" -> bands))
    (group, postings, bands)
  }

  private def docs(df: org.apache.spark.sql.DataFrame) =
    df.select($"doc_id").as[Long].collect().toSet

  test("(a) one transaction, two stores, one visibility point — and " +
      "a pre-transaction reader keeps the old view of BOTH members") {
    val (group, _, _) = freshGroup()
    val before = SnapshotGroup.current(spark, group)
    assert(before.version === 1L)

    val after = SnapshotGroup.transact(spark, group) { txn =>
      txn.compact("postings",
        Seq(("g4", 40L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
        Seq("g", "doc_id"), "pt"): Unit
      txn.retract("bands",
        Seq(("b1", 10L)).toDF("band", "doc_id").withColumn("pt", lit(0)),
        Seq("band", "doc_id"), "pt"): Unit
    }
    assert(after.version === 2L)
    // through the group: both advances visible together
    assert(docs(SnapshotGroup.read(spark, group, "postings"))
      === Set(10L, 20L, 30L, 40L))
    assert(docs(SnapshotGroup.read(spark, group, "bands")) === Set(20L))
    // the pre-transaction reader's pinned view: OLD versions of both
    assert(docs(SnapshotGroup.read(spark, group, "postings", before))
      === Set(10L, 20L, 30L))
    assert(docs(SnapshotGroup.read(spark, group, "bands", before))
      === Set(10L, 20L))
  }

  test("(b) 16 racing transactions: exactly one wins, members advance " +
      "exactly once") {
    val (group, postings, bands) = freshGroup()
    val results = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 16).map { i =>
      new Thread(() =>
        try {
          SnapshotGroup.transact(spark, group) { txn =>
            txn.compact("postings",
              Seq((s"gx$i", 100L + i)).toDF("g", "doc_id")
                .withColumn("pt", lit(0)),
              Seq("g", "doc_id"), "pt"): Unit
            txn.compact("bands",
              Seq((s"bx$i", 100L + i)).toDF("band", "doc_id")
                .withColumn("pt", lit(0)),
              Seq("band", "doc_id"), "pt"): Unit
          }
          results.add(s"win-$i")
        } catch {
          case _: ConcurrentCommitException => results.add(s"refused-$i")
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val wins = results.asScala.toSeq.filter(_.startsWith("win"))
    assert(wins.size === 1, s"group arbitration failed: $wins")
    assert(SnapshotGroup.current(spark, group).version === 2L)
    // the losers never touched the members
    assert(SnapshotStore.current(spark, postings).version === 2L)
    assert(SnapshotStore.current(spark, bands).version === 2L)
  }

  test("(c) a mid-transaction crash leaves group readers atomic, " +
      "wedges loudly, and rollback + retry lands cleanly") {
    val (group, postings, _) = freshGroup()
    intercept[RuntimeException] {
      SnapshotGroup.transact(spark, group) { txn =>
        txn.compact("postings",
          Seq(("g4", 40L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
          Seq("g", "doc_id"), "pt"): Unit
        throw new RuntimeException("transaction died mid-way")
      }
    }
    // the postings store HAS a new physical version...
    assert(SnapshotStore.current(spark, postings).version === 2L)
    // ...but group readers see the old state of BOTH members
    assert(SnapshotGroup.current(spark, group).version === 1L)
    assert(docs(SnapshotGroup.read(spark, group, "postings"))
      === Set(10L, 20L, 30L))
    // the group is wedged loudly until the operator acts
    intercept[ConcurrentCommitException] {
      SnapshotGroup.transact(spark, group)(_ => ())
    }
    // rollback removes the orphan member version and releases the claim
    assert(SnapshotGroup.rollback(spark, group) === 1)
    assert(SnapshotStore.current(spark, postings).version === 1L)
    val retried = SnapshotGroup.transact(spark, group) { txn =>
      txn.compact("postings",
        Seq(("g4", 40L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
        Seq("g", "doc_id"), "pt"): Unit
    }
    assert(retried.version === 2L)
    assert(docs(SnapshotGroup.read(spark, group, "postings"))
      === Set(10L, 20L, 30L, 40L))
  }

  test("group-aware vacuum retains every member version a surviving " +
      "group manifest pins — member-local retention alone would break " +
      "group time travel") {
    val (group, postings, _) = freshGroup()
    // txn1 RETRACTS g1 (pt=0 rewritten — v1's original pt=0 file is
    // thereafter referenced by v1 ONLY, the reclaimable witness); txn2
    // and txn3 compact — group ends at v4, postings at store v4
    SnapshotGroup.transact(spark, group) { txn =>
      txn.retract("postings",
        Seq(("g1", 10L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
        Seq("g", "doc_id"), "pt"): Unit
    }
    (0 until 2).foreach { i =>
      SnapshotGroup.transact(spark, group) { txn =>
        txn.compact("postings",
          Seq((s"gv$i", 200L + i)).toDF("g", "doc_id")
            .withColumn("pt", lit(0)),
          Seq("g", "doc_id"), "pt"): Unit
      }
    }
    assert(SnapshotGroup.current(spark, group).version === 4L)
    // keep the newest TWO group versions (v3, v4): postings store
    // versions 3 and 4 are pinned; versions 1-2 retire with group v1-2
    val reclaimed = SnapshotGroup.vacuum(spark, group, keepVersions = 2)
    assert(reclaimed > 0,
      "the retracted partition's v1-only file was not reclaimed")
    // group time travel to the OLDEST retained version still works
    assert(docs(SnapshotGroup.read(spark, group, "postings",
      SnapshotGroup.snapshotAt(spark, group, 3L)))
      === Set(20L, 30L, 200L))
    // the retired group version is gone...
    intercept[Exception] { SnapshotGroup.snapshotAt(spark, group, 1L) }
    // ...and so is the member version only it pinned, while BOTH
    // group-pinned member versions survived member-local keep=1
    intercept[Exception] {
      SnapshotStore.snapshotAt(spark, postings, 1L)
    }
    assert(SnapshotStore.snapshotAt(spark, postings, 3L).files.nonEmpty)
    assert(SnapshotStore.snapshotAt(spark, postings, 4L).files.nonEmpty)
  }

  test("(d) an out-of-band member commit is refused before any member " +
      "commit runs") {
    val (group, postings, bands) = freshGroup()
    // an interloper writes a member DIRECTLY — the enrollment contract
    // violation
    SnapshotStore.compact(spark, postings,
      Seq(("rogue", 999L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
      Seq("g", "doc_id"), "pt")
    val ex = intercept[ConcurrentCommitException] {
      SnapshotGroup.transact(spark, group) { txn =>
        txn.compact("bands",
          Seq(("b3", 30L)).toDF("band", "doc_id").withColumn("pt", lit(0)),
          Seq("band", "doc_id"), "pt"): Unit
      }
    }
    assert(ex.getMessage.contains("out of band"))
    // the refused transaction committed NOTHING to any member
    assert(SnapshotStore.current(spark, bands).version === 1L)
    // the operator's recovery for a LEGITIMATE external commit is
    // adopt (rollback would destroy it): the next group version pins
    // the interloper's state, and transactions resume
    val adopted = SnapshotGroup.adopt(spark, group)
    assert(adopted.version === 2L && adopted.members("postings") === 2L)
    assert(docs(SnapshotGroup.read(spark, group, "postings"))
      .contains(999L))
    val resumed = SnapshotGroup.transact(spark, group) { txn =>
      txn.compact("bands",
        Seq(("b3", 30L)).toDF("band", "doc_id").withColumn("pt", lit(0)),
        Seq("band", "doc_id"), "pt"): Unit
    }
    assert(resumed.version === 3L)
    assert(docs(SnapshotGroup.read(spark, group, "bands"))
      === Set(10L, 20L, 30L))
  }

  test("(f) MEMBERSHIP EVOLUTION: a third store enrolls mid-history as " +
      "an ordinary group commit; pre-enrollment time travel is exact " +
      "and refuses the new name; withdraw removes it forward-only; " +
      "group-aware vacuum spans the membership change") {
    val (group, postings, _) = freshGroup()                    // group v1
    SnapshotGroup.transact(spark, group) { txn =>              // group v2
      txn.compact("postings",
        Seq(("g4", 40L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
        Seq("g", "doc_id"), "pt"): Unit
    }
    // the third store initializes OUTSIDE the group, then enrolls
    val scores = java.nio.file.Files.createTempDirectory("snapgrp_scores")
      .resolve("scores").toString
    SnapshotStore.init(spark, scores,
      Seq(("s1", 10L, 0), ("s2", 20L, 1)).toDF("k", "doc_id", "pt"), "pt")
    val enrolled = SnapshotGroup.enroll(spark, group, "scores", scores)
    assert(enrolled.version === 3L)
    assert(enrolled.members === Map(
      "postings" -> 2L, "bands" -> 1L, "scores" -> 1L))
    // double-enroll refused; withdraw of a non-member refused
    intercept[IllegalArgumentException] {
      SnapshotGroup.enroll(spark, group, "scores", scores)
    }
    intercept[IllegalArgumentException] {
      SnapshotGroup.withdraw(spark, group, "nope")
    }

    // transactions now span all three members
    SnapshotGroup.transact(spark, group) { txn =>              // group v4
      txn.compact("scores",
        Seq(("s3", 30L)).toDF("k", "doc_id").withColumn("pt", lit(0)),
        Seq("k", "doc_id"), "pt"): Unit
      txn.compact("postings",
        Seq(("g5", 50L)).toDF("g", "doc_id").withColumn("pt", lit(1)),
        Seq("g", "doc_id"), "pt"): Unit
    }
    assert(docs(SnapshotGroup.read(spark, group, "scores"))
      === Set(10L, 20L, 30L))

    // PRE-ENROLLMENT TIME TRAVEL: group v2 knows no "scores" — it
    // refuses by name rather than inventing history — and resolves
    // the other members exactly as committed
    val v2 = SnapshotGroup.snapshotAt(spark, group, 2L)
    intercept[IllegalArgumentException] {
      SnapshotGroup.read(spark, group, "scores", v2)
    }
    assert(docs(SnapshotGroup.read(spark, group, "postings", v2))
      === Set(10L, 20L, 30L, 40L))
    assert(!SnapshotGroup.membersAt(spark, group, 2L).contains("scores"))
    assert(SnapshotGroup.membersAt(spark, group, 4L).contains("scores"))

    // group-grain diff across the enrollment: scores reports the -1
    // not-enrolled sentinel on the from side, postings its real move
    val moved = SnapshotGroup.changedMembers(spark, group, 2L, 4L)
    assert(moved("scores") === ((-1L, 2L)))
    assert(moved("postings") === ((2L, 3L)))
    val feeds = SnapshotGroup.diff(spark, group, 2L, 4L,
      Map("postings" -> Seq("g", "doc_id"), "scores" -> Seq("k", "doc_id")))
    assert(feeds.keySet === Set("postings"),
      "a mid-interval enrollee must be skipped, not half-diffed")
    assert(feeds("postings").select($"g", $"doc_id")
      .as[(String, Long)].collect().toSet === Set(("g5", 50L)))

    // WITHDRAW: forward-only removal; retained history still reads it
    val after = SnapshotGroup.withdraw(spark, group, "scores") // group v5
    assert(after.members.keySet === Set("postings", "bands"))
    intercept[IllegalArgumentException] {
      SnapshotGroup.read(spark, group, "scores")
    }
    assert(docs(SnapshotGroup.read(spark, group, "scores",
      SnapshotGroup.snapshotAt(spark, group, 4L))) === Set(10L, 20L, 30L))

    // GROUP-AWARE VACUUM across the membership change: keep v4..v5 —
    // v4 still pins scores@2, so the scores store must keep version 2
    // readable through member-local keep=1
    SnapshotGroup.vacuum(spark, group, keepVersions = 2)
    assert(docs(SnapshotGroup.read(spark, group, "scores",
      SnapshotGroup.snapshotAt(spark, group, 4L))) === Set(10L, 20L, 30L),
      "vacuum broke group time travel to the withdrawn member's pin")
    assert(docs(SnapshotGroup.read(spark, group, "postings"))
      === Set(10L, 20L, 30L, 40L, 50L))
    intercept[Exception] { SnapshotGroup.snapshotAt(spark, group, 2L) }
  }

  test("(e) racing adopters arbitrate on the CLAIM, not the rename: " +
      "16 racers produce exactly one group version; a dead writer's " +
      "held claim needs the explicit breakClaim takeover") {
    val (group, postings, _) = freshGroup()
    // the out-of-band move both adopters want to bless
    SnapshotStore.compact(spark, postings,
      Seq(("rogue", 999L)).toDF("g", "doc_id").withColumn("pt", lit(0)),
      Seq("g", "doc_id"), "pt")
    // 16 racing adopters — the old arm discarded the claim result and
    // let the rename arbitrate (unspecified FileSystem semantics, the
    // exact gap the store commit protocol closed). An adopter re-reads
    // current() before claiming, so a racer starting after a winner
    // published may legitimately land the NEXT version — the invariant
    // is per-version exclusivity: no two adopters ever return the SAME
    // version, every loser throws the claim's loud refusal (never a
    // publish-time rename crash), and the version count equals the
    // win count exactly.
    val wins = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val losses = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (0 until 16).map { _ =>
      new Thread(() =>
        try { wins.add(SnapshotGroup.adopt(spark, group).version); () }
        catch {
          case _: ConcurrentCommitException => losses.add("refused"); ()
          case t: Throwable => losses.add(s"CRASH:${t.getMessage}"); ()
        })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val wonVersions = wins.asScala.toSeq
    assert(wonVersions.nonEmpty, "no adopter won at all")
    assert(wonVersions.distinct.size === wonVersions.size,
      s"two adopters both published the same version: $wonVersions")
    assert(losses.asScala.forall(_ == "refused"),
      s"a losing adopter crashed instead of the claim's loud refusal: " +
        s"${losses.asScala.filterNot(_ == "refused")}")
    val adopted = SnapshotGroup.current(spark, group)
    assert(adopted.version === 1L + wonVersions.size,
      "version count and win count diverged")
    assert(adopted.members("postings") === 2L)

    // takeover discipline: a claim held by a CONFIRMED-DEAD writer is
    // no longer tolerated implicitly — adopt refuses until the
    // operator's explicit breakClaim clears it
    val pending = adopted.version + 1
    val fs = new org.apache.hadoop.fs.Path(group)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(SnapshotStore.ExclusiveCreateClaim.claim(fs,
      new org.apache.hadoop.fs.Path(group,
        f"_manifests/v$pending%09d.claim")))
    intercept[ConcurrentCommitException] { SnapshotGroup.adopt(spark, group) }
    assert(SnapshotGroup.breakClaim(spark, group, pending))
    assert(SnapshotGroup.adopt(spark, group).version === pending)
    // a PUBLISHED group version's claim is history, not a stale lock
    intercept[IllegalArgumentException] {
      SnapshotGroup.breakClaim(spark, group, pending)
    }
  }
}
