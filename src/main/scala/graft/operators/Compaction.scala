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

  private def dataFiles(dir: String, suffix: String): Array[java.io.File] =
    Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(suffix))

  private def parquetFooterRows(path: String): Long = {
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(path),
        new org.apache.hadoop.conf.Configuration()))
    try reader.getRecordCount finally reader.close()
  }

  private def orcFooterRows(path: String): Long = {
    val reader = org.apache.orc.OrcFile.createReader(
      new org.apache.hadoop.fs.Path(path),
      org.apache.orc.OrcFile.readerOptions(
        new org.apache.hadoop.conf.Configuration()))
    try reader.getNumberOfRows finally reader.close()
  }

  /** Sum of footer row counts over data files — METADATA-only row-count
    * verification (each footer read is a few KB of tail bytes, never the
    * data pages; both parquet and ORC store the row count there).
    * Re-scanning both sides to count rows would double the I/O of a
    * 100 TB maintenance pass; footers make verification proportional to
    * file COUNT. Small file sets read on the driver (same cost as the
    * listing); large ones fan out as tasks.
    */
  private[graft] def footerRowCount(spark: SparkSession,
      files: Seq[String], format: String = "parquet"): Long = {
    val oneFooter: String => Long =
      if (format == "orc") orcFooterRows else parquetFooterRows
    if (files.isEmpty) 0L
    else if (files.length <= 64) files.map(oneFooter).sum
    else spark.sparkContext
      .parallelize(files, math.min(files.length / 16 + 1, 256))
      .map(oneFooter).sum().toLong
  }

  /** Compact `inDir`'s data files into `outDir` targeting `targetBytes`
    * per output file. `format` is `parquet` (default) or `orc` (the
    * declared Vortex substitute) — the same AQE-rebalance rewrite either
    * way. Returns row count (verified equal on both sides from file
    * FOOTERS — no data re-scan) and the before/after file counts.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L * 1024 * 1024,
      format: String = "parquet"): Result = {
    require(format == "parquet" || format == "orc",
      s"unsupported compaction format: $format")
    val suffix = s".$format"
    val before = dataFiles(inDir, suffix)
    val df = spark.read.format(format).load(inDir)
    withAdvisorySize(spark, targetBytes) {
      df.hint("rebalance").write.mode("overwrite").format(format).save(outDir)
    }
    val after = dataFiles(outDir, suffix)
    val inRows = footerRowCount(spark, before.map(_.getPath).toSeq, format)
    val rows = footerRowCount(spark, after.map(_.getPath).toSeq, format)
    require(rows == inRows, s"compaction changed row count: $inRows -> $rows")
    Result(rows, before.length, after.length)
  }

  /** Cluster-compact: like [[compact]], but rows are RANGE-partitIONED and
    * sorted by `clusterCols` on the way out, so every output file (and
    * every parquet row group / ORC stripe inside it) covers a narrow key
    * range. Column min/max statistics then turn key predicates into DATA
    * SKIPPING at read time — the reader decodes only the row groups whose
    * range can match — which is the layout lever (Z-order's 1-D special
    * case) behind clustered tables in every lakehouse table format. The
    * price over plain compaction is the same single shuffle (range instead
    * of rebalance) plus an in-partition sort; at 100 TB this is the
    * difference between a point lookup scanning one row group and
    * scanning the table. SourcesSpec proves the skip with task
    * recordsRead on a selective key scan, clustered vs rebalance-only.
    *
    * `writeOptions` passes format knobs (e.g. a small `parquet.block.size`
    * to get several row groups per file where row-group granularity
    * matters at test scale).
    */
  def compactClustered(spark: SparkSession, inDir: String, outDir: String,
      clusterCols: Seq[String], targetBytes: Long = 128L * 1024 * 1024,
      format: String = "parquet",
      writeOptions: Map[String, String] = Map.empty): Result = {
    require(format == "parquet" || format == "orc",
      s"unsupported compaction format: $format")
    require(clusterCols.nonEmpty, "compactClustered needs cluster columns")
    import org.apache.spark.sql.functions.col
    val suffix = s".$format"
    val before = dataFiles(inDir, suffix)
    val df = spark.read.format(format).load(inDir)
    withAdvisorySize(spark, targetBytes) {
      df.repartitionByRange(clusterCols.map(col): _*)
        .sortWithinPartitions(clusterCols.map(col): _*)
        .write.mode("overwrite").options(writeOptions).format(format)
        .save(outDir)
    }
    val after = dataFiles(outDir, suffix)
    val inRows = footerRowCount(spark, before.map(_.getPath).toSeq, format)
    val rows = footerRowCount(spark, after.map(_.getPath).toSeq, format)
    require(rows == inRows, s"compaction changed row count: $inRows -> $rows")
    Result(rows, before.length, after.length)
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
