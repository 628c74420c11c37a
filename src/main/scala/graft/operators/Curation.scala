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

  /** Surviving doc_ids with status column. Near-dup policy: one
    * representative per TRANSITIVE near-dup cluster (the component's
    * minimum doc_id), via [[Dedup.clusters]]. Pair-wise dropping (delete
    * the larger side of each pair) over-keeps when a component's detected
    * edges skip members — e.g. component {5,7,9} with edges 5-9 and 7-9
    * drops only 9, keeping both 5 and 7; the cluster policy keeps 5 alone.
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
    // kept1 feeds both the near-dup stage and the final join, and the
    // cluster stage's iterative checkpoints already force execution —
    // checkpoint the narrow (doc_id, text) survivor set once instead of
    // re-running quality + exact dedup for each consumer
    val kept1 = kept0.join(canonical, "doc_id").localCheckpoint(true)
    val representatives =
      Dedup.clusterAssignments(kept1, minEstJaccard = nearDupThreshold)
        .filter(col("doc_id") === col("cluster_id"))
        .select(col("doc_id"))
    kept1.join(representatives, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), lit("kept").as("status"))
  }

  /** Source-priority canonical selection: within each EXACT-duplicate
    * group (same text bytes), keep the copy from the most-trusted source —
    * the standard multi-crawl curation rule (a page captured by both a
    * curated dump and a broad crawl keeps the curated copy, preserving its
    * metadata), where plain [[Dedup.exact]] keeps the lowest doc_id
    * regardless of provenance. `priority` maps source → rank (lower wins);
    * unlisted sources rank last; ties inside a rank break on doc_id, so
    * selection is total and engine-replayable.
    *
    * One window over the same md5 grouping exact dedup shuffles on —
    * identical scale shape (one exchange keyed by a 16-byte digest),
    * constant state per group.
    */
  def canonicalBySource(docs: DataFrame,
      priority: Map[String, Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rank = priority.foldLeft(lit(999)) { case (acc, (s, r)) =>
      when(col("source") === s, lit(r)).otherwise(acc)
    }
    val w = Window.partitionBy(md5(col("text")))
      .orderBy(col("src_rank"), col("doc_id"))
    docs.withColumn("src_rank", rank)
      .withColumn("canonical_id",
        first(col("doc_id")).over(w))
      .withColumn("group_size",
        count(lit(1)).over(Window.partitionBy(md5(col("text")))))
      .select(col("doc_id"), col("source"),
        col("canonical_id"), col("group_size"),
        (col("doc_id") === col("canonical_id")).as("keep"))
  }
}
