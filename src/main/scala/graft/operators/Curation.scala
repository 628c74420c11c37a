package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the pipeline operators composed the
  * way a 100 TB corpus run would chain them —
  *
  *   1. cheap narrow quality filter first (drops rows before anything
  *      shuffles),
  *   2. exact dedup (one shuffle on a 16-byte digest),
  *   3. MinHash-LSH near-dup removal over the survivors only.
  *
  * Each stage shrinks the data the next (more expensive) stage sees; the
  * composition stays fully declarative, so Catalyst pipelines the stages
  * and AQE sizes every shuffle from runtime statistics.
  */
object Curation {

  /** Surviving doc_ids with status column. Near-dup policy: within an
    * estimated-Jaccard pair above the threshold, the lower doc_id wins.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.3,
      nearDupThreshold: Double = 0.75): DataFrame = {
    val quality = TextOps.qualityScore(docs)
      .filter(col("quality_score") >= minQuality)
      .select(col("doc_id"))
    val kept0 = docs.join(quality, "doc_id")
    val canonical = Dedup.exact(kept0)
      .filter(col("doc_id") === col("canonical_id"))
      .select(col("doc_id"))
    val kept1 = kept0.join(canonical, "doc_id")
    val nearDups = Dedup.minhashLshPairs(kept1)
      .filter(col("est_jaccard") >= nearDupThreshold)
      .select(col("b").as("doc_id"))
      .distinct()
    kept1.join(nearDups, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("kept").as("status"))
  }
}
