package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: per-dimension affine int8 — the standard 4×
  * memory/bandwidth cut for corpus-scale embedding stores (and the
  * precondition for cache-resident ANN at 100 TB).
  *
  * Two passes, both scale-clean:
  *   1. per-dimension min/max — one aggregation whose output is dim rows
  *      (bytes, not data), collected to the driver;
  *   2. a purely narrow per-row `transform` against the stats as literal
  *      arrays — no join, no shuffle, whole-stage codegen.
  *
  * Quantized values are integers, so results hash exactly across engines
  * (the DuckDB oracle replays the identical double arithmetic:
  * `round((v - mn) * 255 / (mx - mn))`).
  */
object Quantize {

  /** Per-dimension (min, max) over the corpus, ordered by dimension. */
  def int8Stats(emb: DataFrame): Array[(Double, Double)] =
    emb.select(posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .orderBy(col("i"))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))

  private def quantExpr(vec: Column, mns: Seq[Double], mxs: Seq[Double]): Column =
    transform(vec, (v, i) => {
      val mn = element_at(typedlit(mns), i + 1)
      val mx = element_at(typedlit(mxs), i + 1)
      when(mx === mn, lit(0L))
        .otherwise(round((v.cast("double") - mn) * 255.0 / (mx - mn)).cast("long"))
    })

  /** (vec_id, qvec) with qvec ∈ [0, 255]^dim. Constant dimensions map
    * to 0.
    */
  def int8(emb: DataFrame): DataFrame = {
    val stats = int8Stats(emb)
    emb.select(col("vec_id"),
      quantExpr(col("embedding"), stats.map(_._1).toSeq,
        stats.map(_._2).toSeq).as("qvec"))
  }

  /** Inverse map for error analysis: v̂_i = mn_i + q_i·(mx_i − mn_i)/255. */
  def dequantize(qvec: Column, stats: Array[(Double, Double)]): Column =
    transform(qvec, (q, i) => {
      val mn = element_at(typedlit(stats.map(_._1).toSeq), i + 1)
      val mx = element_at(typedlit(stats.map(_._2).toSeq), i + 1)
      mn + q.cast("double") * (mx - mn) / 255.0
    })
}
