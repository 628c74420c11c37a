package graft.tables

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Observability requests table (reference
  * `crates/datafusion-app/src/observability/mod.rs:42-158`): one row appended
  * per executed request. Schema mirrors the reference with unsigned types
  * widened (UInt64 rows -> LongType, UInt16 status -> IntegerType).
  */
class Observability(spark: SparkSession) {
  import Observability._

  private val buf = ArrayBuffer.empty[Row]

  def record(requestId: Option[String], path: String, sql: Option[String],
      timestamp: Timestamp, durationMs: Long, rows: Option[Long],
      status: Int): Unit = synchronized {
    buf += Row(requestId.orNull, path, sql.orNull, timestamp, durationMs,
      rows.map(Long.box).orNull, status)
    // every observed request also lands in the TUI's log ring
    graft.core.LogRing.add(
      s"$path status=$status ${durationMs}ms" +
        sql.map(q => s" :: ${q.replace('\n', ' ').take(80)}").getOrElse(""))
    register()
  }

  def toDF: DataFrame = synchronized {
    spark.createDataFrame(spark.sparkContext.parallelize(buf.toSeq, 1), schema)
  }

  /** Snapshot of the recorded rows (driver-side; the buffer is the same
    * bounded request log the temp view serves). Feeds the /metrics
    * exposition without a Spark job.
    */
  def records: Seq[Row] = synchronized(buf.toList)

  /** Expose as `observability_requests` (Spark temp views are single-level;
    * the reference name is `dft.observability.requests`).
    */
  def register(): Unit = toDF.createOrReplaceTempView("observability_requests")

  /** Route streaming micro-batches into the same spine (round-7 directive:
    * the reference records per-request rows from every frontend, and the
    * streaming queries otherwise bypass observability): one row per
    * micro-batch — request_id `<queryId>#<batchId>`, path
    * `stream:<queryName>`, rows = the batch's input rows, duration = the
    * trigger's execution wall. Opt-in (call once per session owner, e.g.
    * the TUI): listener events are delivered asynchronously, so an
    * always-on listener could re-register the shared temp view while an
    * unrelated batch query reads it. Returns the listener for detach.
    */
  def attachStreaming(): org.apache.spark.sql.streaming.StreamingQueryListener = {
    import org.apache.spark.sql.streaming.StreamingQueryListener
    val l = new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        graft.core.LogRing.add(
          s"stream ${Option(e.name).getOrElse(e.id.toString)} started")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        record(
          Some(s"${p.id}#${p.batchId}"),
          s"stream:${Option(p.name).getOrElse("unnamed")}",
          None,
          new Timestamp(java.time.Instant.parse(p.timestamp).toEpochMilli),
          Option(p.durationMs.get("triggerExecution"))
            .map(_.longValue).getOrElse(-1L),
          Some(p.numInputRows),
          200)
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        graft.core.LogRing.add(s"stream ${e.id} terminated" +
          e.exception.map(x => s" with error: ${x.take(80)}").getOrElse(""))
    }
    spark.streams.addListener(l)
    l
  }
}

object Observability {
  val schema: StructType = StructType(Seq(
    StructField("request_id", StringType, nullable = true),
    StructField("path", StringType, nullable = false),
    StructField("sql", StringType, nullable = true),
    StructField("timestamp", TimestampType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("rows", LongType, nullable = true),
    StructField("status", IntegerType, nullable = false)))
}
