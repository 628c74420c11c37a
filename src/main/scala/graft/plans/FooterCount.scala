package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** Metadata-only `COUNT(*)`: an optimizer rule that answers an unfiltered
  * count over a parquet relation from the files' FOOTERS instead of
  * scanning data pages — at 100 TB the difference between touching a few
  * KB of tail bytes per file and decoding the table. This is the custom
  * `Rule[LogicalPlan]` lever the engine reserves for semantics Catalyst
  * doesn't already provide (DataFusion and DuckDB both short-circuit this
  * shape; Spark scans).
  *
  * Fires ONLY on the exact safe shape: a global aggregate (no grouping)
  * whose every output is a literal-count `count(1)`/`count(*)` — no
  * DISTINCT, no agg filter clause — directly over a parquet
  * `LogicalRelation` (optionally through the empty `Project` column
  * pruning leaves). Any Filter above the relation, any other aggregate,
  * any other source format leaves the plan untouched, so the rule can
  * never change a result: row counts are projection-invariant and the
  * footer count IS the file row count.
  */
case class FooterCountRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def isCountStar(e: AggregateExpression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(_, _))), Complete, false, None, _) => true
    case _ => false
  }

  private def plainParquet(plan: LogicalPlan): Option[HadoopFsRelation] =
    plan match {
      case lr: LogicalRelation if !lr.isStreaming =>
        lr.relation match {
          case fs: HadoopFsRelation
              if fs.fileFormat.isInstanceOf[ParquetFileFormat] => Some(fs)
          case _ => None
        }
      case Project(Nil, child) => plainParquet(child)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate
        if agg.groupingExpressions.isEmpty &&
          agg.aggregateExpressions.nonEmpty &&
          agg.aggregateExpressions.forall {
            case Alias(ae: AggregateExpression, _) => isCountStar(ae)
            case _ => false
          } =>
      plainParquet(agg.child) match {
        case Some(fs) =>
          // same contract as FooterStatsRule: the fold does real I/O, and
          // a footer vanishing between listing and read must keep the
          // scan, never fail the query the rule exists to accelerate
          try {
            val n = graft.operators.Compaction.footerRowCount(spark,
              fs.location.inputFiles.toSeq)
            LocalRelation(agg.output,
              Seq(InternalRow.fromSeq(agg.output.map(_ => n))))
          } catch {
            case scala.util.control.NonFatal(_) => agg
          }
        case None => agg
      }
  }
}

object FooterCount {
  /** Install the rule on an existing session (idempotent) — the
    * `experimentalMethods` hook, which appends user rules as a final
    * optimizer batch.
    */
  def enable(spark: SparkSession): Unit = {
    val em = spark.sessionState.experimentalMethods
    if (!em.extraOptimizations.exists(_.isInstanceOf[FooterCountRule]))
      em.extraOptimizations = em.extraOptimizations :+ FooterCountRule(spark)
  }
}
