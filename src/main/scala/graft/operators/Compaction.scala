package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-file compaction: rewrite a directory of many undersized parquet
  * files into target-sized ones. The 100 TB maintenance operation every
  * long-lived table needs — streaming sinks and over-parallel writers
  * produce kilobyte files whose open/footer overhead eventually dominates
  * scan time and overwhelms driver file listings.
  *
  * Built on AQE rebalance (the `REBALANCE` hint): the shuffle write sizes
  * output partitions to `spark.sql.adaptive.advisoryPartitionSizeInBytes`
  * from RUNTIME statistics — skewed partitions split, tiny ones coalesce —
  * so the operator needs no row-count heuristics of its own and scales to
  * any input distribution. One shuffle, the unavoidable price of changing
  * file boundaries.
  */
object Compaction {

  final case class Result(rows: Long, filesBefore: Int, filesAfter: Int)

  private def parquetFiles(dir: String): Array[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))

  /** Compact `inDir`'s parquet files into `outDir` targeting
    * `targetBytes` per output file. Returns row count (verified equal on
    * both sides) and the before/after file counts.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024): Result = {
    val before = parquetFiles(inDir).length
    val df = spark.read.parquet(inDir)
    val rows = withAdvisorySize(spark, targetBytes) {
      val rebalanced = df.hint("rebalance")
      rebalanced.write.mode("overwrite").parquet(outDir)
      spark.read.parquet(outDir).count()
    }
    val inRows = df.count()
    require(rows == inRows, s"compaction changed row count: $inRows -> $rows")
    Result(rows, before, parquetFiles(outDir).length)
  }

  private def withAdvisorySize[A](spark: SparkSession, bytes: Long)(f: => A): A = {
    val key = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, bytes.toString)
    try f
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
