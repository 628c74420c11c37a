package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed token-budget packs for
  * training-batch construction. Streaming fill in doc_id order — a doc
  * lands in pack `floor(prior_tokens / budget)` of its shard, where
  * prior_tokens is the running token count of earlier docs in the shard
  * (a pack may overflow by the one document that crosses the boundary,
  * the standard greedy fill).
  *
  * Scale shape: packing is SHARD-LOCAL. A single global greedy pack is a
  * total order — one reducer at any size; sharding on `doc_id / shardSize`
  * makes the running-sum window per-shard (bounded rows each) and the
  * whole operator embarrassingly parallel, at the cost of at most one
  * underfilled pack per shard. `nTokens` picks the budget unit: real
  * merges-file BPE counts by default ([[TextOps.bpeTokenCount]] — token
  * budgets are load-bearing for training batches, and whitespace counts
  * under-count on real text), replayable exactly by the DuckDB oracle.
  */
object Packing {

  /** `carry` names columns of `docs` to ride through the packing window
    * untouched (e.g. `source` for a training manifest) — they cost their
    * own bytes in the one shard exchange but save the caller a re-join
    * against its input to recover them (the join is a second read of the
    * input plus a whole extra stage; carrying narrow columns through the
    * exchange is strictly cheaper).
    */
  def packByBudget(docs: DataFrame, budget: Int = 512,
      shardSize: Int = 100,
      nTokens: Column => Column = TextOps.bpeTokenCount(_),
      carry: Seq[String] = Seq.empty): DataFrame = {
    val reserved = Set("doc_id", "n_tokens", "shard", "prior", "pack_id")
    require(carry.forall(c => !reserved.contains(c)),
      s"carry columns ${carry.filter(reserved.contains).mkString(", ")} collide " +
        s"with packByBudget's generated columns (${reserved.mkString(", ")})")
    require(carry.distinct.length == carry.length,
      s"carry columns must be distinct, got ${carry.mkString(", ")}")
    graft.functions.NativeFunctions.register(docs.sparkSession)
    val base = docs.select(
      col("doc_id") +:
      nTokens(col("text")).cast("long").as("n_tokens") +:
      floor(col("doc_id") / shardSize.toDouble).cast("long").as("shard") +:
      carry.map(c => col(s"`$c`")): _*)
    val prior = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("prior", coalesce(sum(col("n_tokens")).over(prior), lit(0L)))
      .withColumn("pack_id",
        floor(col("prior") / budget.toDouble).cast("long"))
      .drop("prior")
  }
}
