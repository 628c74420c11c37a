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

  /** Salted equi-join: spread each of the large side's keys over `salts`
    * sub-keys and replicate the small side once per salt, so a hot key's
    * rows land on `salts` reducers instead of one. The join condition
    * becomes (key, salt)-equality — results are identical to the plain
    * equi-join for any salt assignment, which is why the operator is
    * oracle-checkable against the unsalted SQL.
    *
    * The salt is a deterministic hash of the large side's entire row (not
    * a random number: reruns and retried tasks must salt identically, or
    * speculative execution produces duplicates). Use when a specific join
    * is known-skewed and AQE's runtime skew-split (which handles the
    * residual general case) isn't enough — e.g. a heavy-hitter key that
    * is also a single HASH partition, which AQE can split only after
    * materializing it once.
    *
    * The small side grows `salts`×, so keep `salts` modest (8-32) and the
    * small side broadcast-sized or near it.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = "__graft_salt"
    val salted = large.withColumn(saltCol,
      pmod(xxhash64(large.columns.map(col): _*), lit(salts.toLong)))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }
}
