package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe aggregation rewrites. Joins get skew handling from AQE
  * (splitting oversized partitions at runtime); aggregation-side skew
  * needs plan-shape fixes like these.
  */
object Skew {

  /** Exact COUNT(DISTINCT value) per key without funnelling every value of
    * a hot key through one reducer: stage 1 dedups on (key, value) — the
    * value component spreads a hot key across the cluster — stage 2 counts
    * the deduped rows per key. Same result as countDistinct (NULL values
    * are excluded before the dedup, matching COUNT(DISTINCT)'s NULL
    * semantics; a key whose values are all NULL does not appear), bounded
    * per-task state at any skew.
    */
  def exactDistinctCount(df: DataFrame, key: Column, value: Column): DataFrame =
    df.select(key.as("key"), value.as("value"))
      .filter(col("value").isNotNull)
      .distinct()
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_distinct"))
}
