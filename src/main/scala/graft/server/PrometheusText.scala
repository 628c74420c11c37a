package graft.server

import org.apache.spark.sql.Row

/** Prometheus text exposition (version 0.0.4) over the observability
  * records. The reference runs a dedicated metrics server
  * (`src/server/mod.rs` `try_start_metrics_server`) with per-request
  * counters incremented in the FlightSQL service
  * (`src/server/flightsql/service.rs:159,256`); here the same signals —
  * request counts by path/status, a latency histogram, rows served — are
  * derived from the observability table's rows, so `/metrics` needs no
  * second bookkeeping path and no dependencies.
  */
object PrometheusText {

  private val latencyBucketsMs: Seq[Long] =
    Seq(5L, 10L, 25L, 50L, 100L, 250L, 500L, 1000L, 2500L, 5000L)

  /** Render the standard families from observability rows
    * (request_id, path, sql, timestamp, duration_ms, rows, status).
    */
  def render(records: Seq[Row]): String = {
    val sb = new StringBuilder

    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

    sb ++= "# HELP graft_requests_total Requests served, by path and status.\n"
    sb ++= "# TYPE graft_requests_total counter\n"
    records.groupBy(r => (r.getString(1), r.getInt(6)))
      .toSeq.sortBy { case ((p, s), _) => (p, s) }
      .foreach { case ((path, status), rs) =>
        sb ++= s"""graft_requests_total{path="${esc(path)}",status="$status"} ${rs.size}\n"""
      }

    sb ++= "# HELP graft_request_duration_ms Request latency, by path.\n"
    sb ++= "# TYPE graft_request_duration_ms histogram\n"
    records.groupBy(_.getString(1)).toSeq.sortBy(_._1).foreach {
      case (path, rs) =>
        val durations = rs.map(_.getLong(4))
        var cumulative = 0L
        latencyBucketsMs.foreach { le =>
          cumulative = durations.count(_ <= le)
          sb ++= s"""graft_request_duration_ms_bucket{path="${esc(path)}",le="$le"} $cumulative\n"""
        }
        sb ++= s"""graft_request_duration_ms_bucket{path="${esc(path)}",le="+Inf"} ${durations.size}\n"""
        sb ++= s"""graft_request_duration_ms_sum{path="${esc(path)}"} ${durations.sum}\n"""
        sb ++= s"""graft_request_duration_ms_count{path="${esc(path)}"} ${durations.size}\n"""
    }

    sb ++= "# HELP graft_rows_served_total Result rows returned, by path.\n"
    sb ++= "# TYPE graft_rows_served_total counter\n"
    records.groupBy(_.getString(1)).toSeq.sortBy(_._1).foreach {
      case (path, rs) =>
        val rows = rs.flatMap(r => Option(r.get(5)).map(_.asInstanceOf[Long])).sum
        sb ++= s"""graft_rows_served_total{path="${esc(path)}"} $rows\n"""
    }

    sb.result()
  }
}
