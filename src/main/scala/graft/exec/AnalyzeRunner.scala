package graft.exec

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** `--analyze` instrumentation (reference `local.rs:506-555`,
  * `stats.rs:36-762`): execute once, then walk the physical plan collecting
  * SQLMetrics grouped by operator category (scan IO, filter/project/sort/
  * join/aggregate/exchange compute) plus derived selectivity ratios.
  *
  * Divergence (SURVEY §7.4): Spark doesn't expose per-query parquet
  * row-group pruning counts; scan-level SQLMetrics (files, bytes, rows,
  * scan time) stand in for the reference's pruning table.
  */
object AnalyzeRunner {

  final case class OperatorMetrics(category: String, nodeName: String,
      metrics: Map[String, Long])

  final case class AnalyzeReport(operators: Seq[OperatorMetrics]) {

    def rowsByCategory: Map[String, Long] =
      operators.groupBy(_.category).view.mapValues(
        _.flatMap(_.metrics.get("numOutputRows")).sum).toMap

    /** Scan selectivity: rows surviving filters / rows scanned. */
    def selectivity: Option[Double] = {
      val scanned = rowsByCategory.get("scan").filter(_ > 0)
      val filtered = rowsByCategory.get("filter")
      for (s <- scanned; f <- filtered) yield f.toDouble / s.toDouble
    }

    /** Bytes read by the scans (reference IO summary, `stats.rs:78-102`). */
    def bytesScanned: Long =
      operators.filter(_.category == "scan")
        .flatMap(o => o.metrics.view.filterKeys(k =>
          k == "filesSize" || k.toLowerCase.contains("bytesread")).values)
        .sum

    /** Share of summed timing metrics per category (the analog of the
      * reference's per-operator-category compute-time percentages,
      * `stats.rs:429-513`; Spark timing metrics mix units per node, so the
      * shares are indicative, not wall-clock exact).
      */
    def timeShareByCategory: Map[String, Double] = {
      val perCat = operators.groupBy(_.category).view.mapValues(
        _.flatMap(_.metrics.collect {
          case (k, v) if k.toLowerCase.contains("time") => v
        }).sum.toDouble).toMap
      val total = perCat.values.sum
      if (total <= 0) Map.empty
      else perCat.view.mapValues(_ / total * 100.0).toMap
    }

    def summary: String = {
      val shares = timeShareByCategory
      val byCat = operators.groupBy(_.category).toSeq.sortBy(_._1)
      val lines = byCat.map { case (cat, ops) =>
        val rows = ops.flatMap(_.metrics.get("numOutputRows")).sum
        val share = shares.get(cat).map(s => f"  time=$s%5.1f%%").getOrElse("")
        f"  $cat%-10s ops=${ops.size}%3d  output_rows=$rows%12d$share"
      }
      val sel = selectivity.map(s => f"\n  scan->filter selectivity: ${s * 100}%.2f%%").getOrElse("")
      val bytes = if (bytesScanned > 0) f"\n  bytes scanned: $bytesScanned%d" else ""
      s"Analyze Report\n${lines.mkString("\n")}$sel$bytes"
    }
  }

  def categorize(nodeName: String): String = {
    val n = nodeName.toLowerCase
    if (n.contains("scan")) "scan"
    else if (n.contains("filter")) "filter"
    else if (n.contains("project")) "projection"
    else if (n.contains("sort") && !n.contains("mergejoin")) "sort"
    else if (n.contains("join")) "join"
    else if (n.contains("aggregate")) "aggregate"
    else if (n.contains("exchange") || n.contains("shuffle")) "exchange"
    else "other"
  }

  /** Execute the frame and collect per-operator metrics from the final
    * (adaptively re-planned) physical plan.
    */
  def analyze(df: DataFrame): AnalyzeReport = {
    // execute this frame's own plan (df.count() would build a separate
    // QueryExecution and leave these metrics empty)
    df.queryExecution.toRdd.foreachPartition(_ => ())
    val plan = df.queryExecution.executedPlan
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case other =>
        other +: (other.children.flatMap(walk) ++
          other.subqueries.flatMap(walk))
    }
    val ops = walk(plan).map { node =>
      OperatorMetrics(categorize(node.nodeName), node.nodeName,
        node.metrics.map { case (k, m) => k -> m.value }.toMap)
    }
    AnalyzeReport(ops)
  }
}
