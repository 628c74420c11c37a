package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and eval-set screening — the selection
  * operators a training-data pipeline applies after cleaning/dedup:
  *
  *  - hash-Bernoulli sampling: keep a row iff a 16-bit bucket of the
  *    md5 of its key falls under the rate. Purely narrow (a filter the
  *    optimizer pushes to the scan side of any later join), reproducible
  *    across runs/engines, and stable under repartitioning — unlike
  *    `df.sample`, which depends on partition layout and a seed.
  *  - stratified sampling: per-stratum rates (e.g. downsample a dominant
  *    language) joined in from a broadcast rates table, then the same
  *    narrow hash filter. The corpus never shuffles.
  *  - contamination screening: flag corpus documents whose normalized
  *    fingerprint appears in a benchmark/eval set, so test data can be
  *    held out of training corpora. The benchmark side is tiny by nature
  *    and broadcasts; the corpus side is one narrow pass + hash lookup.
  *
  * The md5 bucket is engine-portable (DuckDB: `('0x' ||
  * substring(md5(k),1,4))::BIGINT`), so every operator is oracle-checked
  * end to end like the dedup family.
  */
object Sampling {

  /** Uniform 16-bit bucket [0, 65536) from the md5 of the key's string
    * form.
    */
  def bucket16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** Deterministic Bernoulli sample at `rate` keyed on `key`. */
  def hashBernoulli(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(bucket16(key) < lit(rate) * 65536d)

  /** Per-stratum deterministic sampling. Strata absent from `rates` are
    * dropped (rate 0). The rates relation is rows-per-stratum small, so it
    * broadcasts; the data side stays narrow end to end.
    */
  def stratified(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = rates.toSeq.toDF("stratum", "rate")
    df.join(broadcast(rdf), strata === col("stratum"))
      .filter(bucket16(key) < col("rate") * 65536d)
      .drop("stratum", "rate")
  }

  /** Flag corpus rows whose fingerprint appears in the benchmark set
    * (contamination against eval data). `benchmarkFps` must expose a
    * single `fp` column; it is deduped and broadcast.
    */
  def contaminationScreen(corpus: DataFrame, fp: Column,
      benchmarkFps: DataFrame): DataFrame = {
    val bench = broadcast(
      benchmarkFps.select(col("fp").as("bench_fp")).distinct())
    corpus.withColumn("fp", fp)
      .join(bench, col("fp") === col("bench_fp"), "left")
      .withColumn("contaminated", col("bench_fp").isNotNull)
      .drop("bench_fp")
  }
}
