package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches. COUNT-MIN (Cormode & Muthukrishnan 2005,
  * "An improved data stream summary: the count-min sketch and its
  * applications"): d independent hash rows of w counters; a key's
  * estimate is the MIN over its d cells, which can only OVER-estimate
  * (collisions add, never subtract). The sketch is a d×w integer grid —
  * KBs at any corpus size — and merges by CELL-WISE ADDITION, so
  * per-partition/per-source sketches combine into the exact global
  * sketch: the property that makes it the streaming/distributed
  * heavy-hitter workhorse where exact histograms would shuffle the full
  * key set.
  *
  * Hashing uses the engine's portable md5-bucket idiom
  * ([[Sampling.bucket16]]'s shape, salted by the row index), so a SQL
  * oracle replays every cell and every estimate exactly.
  */
object Sketch {

  /** Row-j bucket of `key` in [0, width): md5("j:key") 16-bit prefix
    * mod width.
    */
  def cmBucket(j: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(j.cast("string"), lit(":"), key)), 1, 4),
      16, 10).cast("long"), lit(width.toLong))

  /** Build the sketch: (j, bucket, cnt) cells, at most depth×width rows.
    * ONE shuffle on (j, bucket) — depth×width keys however large the
    * input — with map-side partial aggregation doing the per-partition
    * sketching; the final aggregate IS the cell-wise merge of those
    * partition sketches.
    */
  def countMin(keys: DataFrame, key: Column, depth: Int = 4,
      width: Int = 256): DataFrame =
    keys.select(key.as("k"))
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", cmBucket(col("j"), col("k"), width))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Point estimates for `probes` (a small keyed frame with column `k`):
    * min over the d cells. The sketch and the probe set are both tiny —
    * the joins broadcast; nothing corpus-sized moves.
    */
  def cmEstimate(sketch: DataFrame, probes: DataFrame, depth: Int = 4,
      width: Int = 256): DataFrame =
    probes
      .select(col("k"), explode(sequence(lit(0), lit(depth - 1))).as("j"))
      .withColumn("bucket", cmBucket(col("j"), col("k"), width))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy(col("k"))
      .agg(min(col("cnt")).as("est"))
}
