package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import graft.SparkTestBase

/** The packing tape survives a checkpointed restart: the per-stream
  * running token offset is the face's ONLY state, and a query that lost
  * it would silently restart every stream's tape at token 0 — giving a
  * post-restart document a window span that overlaps spans already
  * shipped to the trainer (the worst packing bug there is: the same
  * window id holding 2x its token budget). The post-restart doc must
  * continue exactly where the pre-restart tape ended, including
  * MID-WINDOW: with 1000 tokens packed before the restart, the next
  * 2000-token doc must span windows 0..1 starting at token 1000, not
  * windows 0..0 starting at 0. */
class PackChunkRestartSpec extends SparkTestBase {
  import spark.implicits._

  import org.apache.spark.sql.functions.{length, lit}

  private def writeBatch(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text")
      .select($"doc_id", lit("en").as("lang"), lit("web").as("source"),
        $"text", length($"text").cast("long").as("n_chars"))
      .coalesce(1)
      .write.mode(SaveMode.Append).parquet(dir)

  test("the running offset survives a restart, mid-window") {
    val srcDir = Files.createTempDirectory("pack_src").toString
    val outDir = Files.createTempDirectory("pack_out").toString
    val ckptDir = Files.createTempDirectory("pack_ckpt").toString

    def runOnce(): Unit = {
      val q = DocStream.packChunk(spark,
        DocStream.readDocs(spark, srcDir)).toDF()
        .writeStream
        .outputMode("append")
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    // doc_id % 8 == 0 keeps everything on one (lang="en", shard=0) tape
    def doc(tokens: Int): String = Seq.fill(tokens)("w").mkString(" ")

    // run 1: 1000 tokens — the tape ends mid-window-0
    writeBatch(srcDir, Seq((8L, doc(1000))))
    runOnce()

    // run 2 (restart): a 2000-token doc must start at offset 1000 and
    // span windows 0..1 — a state-losing restart would place it at 0..0
    writeBatch(srcDir, Seq((16L, doc(2000))))
    runOnce()

    val got = spark.read.parquet(outDir)
      .select($"doc_id", $"start_tok", $"tok_count",
        $"first_window", $"last_window")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got === Seq(
      (8L, 0L, 1000L, 0L, 0L),
      (16L, 1000L, 2000L, 0L, 1L)))
  }
}
