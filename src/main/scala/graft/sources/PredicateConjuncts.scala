package graft.sources

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared Spark-4 predicate introspection behind partition-conjunct
  * pruning — the Delta log twin ([[DeltaWrite.prunePartitionConjuncts]])
  * and the Iceberg manifest twin (IcebergLog.pruneEntriesByConjuncts)
  * both dispatch here so a soundness tweak can never silently miss one
  * protocol. Spark 4 `Column`s wrap lazy ColumnNodes with no
  * inspectable expression tree until analysis, so the predicate
  * ANALYZES against a zero-row frame of the table's logical schema; the
  * resolved Filter condition splits into top-level AND conjuncts, and
  * only DETERMINISTIC conjuncts referencing NOTHING but partition
  * columns return (as their SQL rendering, for replay over each
  * caller's local tuple frame). Any analysis failure yields Seq.empty —
  * callers treat that as "prune nothing", so this helper can only ever
  * SHRINK a scan, never change an answer.
  */
private[sources] object PredicateConjuncts {
  def partitionOnlySql(spark: SparkSession, schema: StructType,
      predicate: Column, partCols: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.{And, Expression}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    val partSet = partCols.toSet
    try {
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
      val cond = empty.filter(predicate).queryExecution.analyzed
        .collectFirst {
          case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
            f.condition
        }
      cond.toSeq.flatMap(conjuncts)
        .filter(c => c.deterministic && c.references.nonEmpty &&
          c.references.forall(a => partSet.contains(a.name)))
        .map(_.sql)
    } catch { case scala.util.control.NonFatal(_) => Seq.empty }
  }
}
