package graft.streaming

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import graft.{SparkTestBase, Tables}

/** The streaming semantic dedup face must agree with its batch twin
  * when the stream is the replayed increment: every arriving embedding
  * is probed against the STATIC history index only (no within-increment
  * state), so replaying the q_semdedup_incremental increment split
  * through [[DocStream.semanticDedup]] must reproduce the batch
  * survivor set exactly — across micro-batch boundaries, which the
  * two-file mtime-ordered staging forces. */
class SemDedupStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def stageFile(df: DataFrame, dir: Path, name: String,
                        mtime: Long): Unit = {
    val tmp = Files.createTempDirectory("stage_vec_half")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator()
    var src: Path = null
    while (part.hasNext) {
      val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p
    }
    val dest = dir.resolve(name)
    Files.copy(src, dest)
    Files.setLastModifiedTime(dest, FileTime.fromMillis(mtime))
  }

  test("streaming semantic dedup equals the batch anti-join on the " +
      "replayed increment, across micro-batches") {
    val dir = Files.createTempDirectory("vecs_stream_inc")
    val vecs = Tables.table(spark, sf0001, "embeddings")
    // the batch query's split: history < 250, increment >= 250; the
    // increment replays as TWO micro-batches
    stageFile(vecs.filter($"vec_id" >= 250 && $"vec_id" < 375),
      dir, "b0.parquet", 1700000000000L)
    stageFile(vecs.filter($"vec_id" >= 375),
      dir, "b1.parquet", 1700000100000L)

    val history = vecs.filter($"vec_id" < 250)
    val out = DocStream.semanticDedup(
      DocStream.readEmbeddings(spark, dir.toString), history)
    val q = EventStream.runToMemory(out, "sem_dedup", OutputMode.Append())
    q.processAllAvailable(); q.stop()

    val got = spark.table("sem_dedup")
      .select($"vec_id", $"cell").as[(Long, Int)].collect().toSet
    val want = graft.SparkEntry.queries("q_semdedup_incremental")(
        spark, sf0001)
      .as[(Long, Int)].collect().toSet
    assert(got === want)
    // the split must exercise both outcomes for the pin to bite
    assert(got.nonEmpty)
    assert(got.size < 250)
  }
}
