package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Volume metrics via `Dataset.observe` — the scale-correct version of the
  * reference's row-count "volume stats" (reference main.py:48-52, S3):
  * counts are accumulated by the SAME job that runs the query/sink, not by
  * separate `count()` actions that re-scan the data (at 100 TB a second
  * pass per table is a second 100 TB scan). `observe` itself also works on
  * streaming frames, but there the metrics arrive via
  * `StreamingQueryListener` progress events — [[Listener]] below only
  * collects from BATCH query executions; [[StreamingListener]] is its
  * streaming twin.
  */
object Metrics {

  /** Collects observed metrics per observation name. */
  final class Listener extends QueryExecutionListener {
    private val seen = TrieMap.empty[String, Row]
    override def onSuccess(funcName: String, qe: QueryExecution,
                           durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (k, v) => seen.put(k, v) }
    override def onFailure(funcName: String, qe: QueryExecution,
                           exception: Exception): Unit = ()
    def rows(name: String): Option[Long] =
      seen.get(name).map(_.getAs[Long]("rows"))
    def metric(name: String): Option[Row] = seen.get(name)
  }

  /** Register a fresh metrics listener on the session. */
  def attach(spark: SparkSession): Listener = {
    val l = new Listener
    spark.listenerManager.register(l)
    l
  }

  /** Streaming twin of [[Listener]]: observed metrics on a streaming
    * DataFrame arrive once per MICRO-BATCH via StreamingQueryListener
    * progress events (not via QueryExecutionListener, which never sees
    * them), so row counts ACCUMULATE across batches — `rows(name)` is the
    * running total for the whole stream, `lastMetric(name)` the latest
    * batch's full metric row. */
  final class StreamingListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val totals = TrieMap.empty[String, Long]
    private val last = TrieMap.empty[String, Row]
    override def onQueryStarted(event: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(event: QueryProgressEvent): Unit =
      event.progress.observedMetrics.forEach { (k, v) =>
        last.put(k, v)
        if (v.schema != null && v.schema.fieldNames.contains("rows"))
          totals.updateWith(k)(prev =>
            Some(prev.getOrElse(0L) + v.getAs[Long]("rows")))
      }
    def rows(name: String): Option[Long] = totals.get(name)
    def lastMetric(name: String): Option[Row] = last.get(name)
  }

  /** Register a fresh streaming metrics listener on the session; pair
    * with `spark.streams.removeListener` when done. */
  def attachStreaming(spark: SparkSession): StreamingListener = {
    val l = new StreamingListener
    spark.streams.addListener(l)
    l
  }

  /** Piggyback a row count (and optional per-column null counts) onto
    * whatever action later runs this DataFrame. */
  def observeVolume(df: DataFrame, name: String,
                    nullCountCols: Seq[String] = Nil): DataFrame = {
    val aggs = count(lit(1)).as("rows") +:
      nullCountCols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"))
    df.observe(name, aggs.head, aggs.tail: _*)
  }
}
