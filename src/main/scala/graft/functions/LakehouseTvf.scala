package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL table-valued functions over the lakehouse surfaces, as a pre-parse
  * rewrite exactly like [[ParquetMetadataTable.rewrite]] (the reference's
  * `parquet_metadata(...)` seam, `src/args.rs` → datafusion UDTF):
  *
  *  - `table_changes('path', from [, to])` — the Databricks TVF name for
  *    the Delta CHANGE DATA FEED ([[graft.sources.DeltaLog.tableChanges]]);
  *  - `iceberg_snapshots('path')` — the `table$snapshots` inspection
  *    surface: (snapshot_id, operation, manifest_list);
  *  - `iceberg_refs('path')` — the `table$refs` inspection surface:
  *    (name, snapshot_id, type);
  *  - `delta_history('path')` — the `DESCRIBE HISTORY` surface:
  *    (version, timestamp, operation, operation_parameters), newest
  *    first ([[graft.sources.DeltaLog.history]]);
  *  - `iceberg_files('path')` — the `table$files` inspection surface:
  *    (content, file_path, record_count, partition), manifest-only;
  *  - `iceberg_partitions('path')` — the `table$partitions` surface:
  *    (partition, file_count, record_count), manifest-only;
  *  - `delta_files('path')` — the Delta live-file inspection surface:
  *    (file_path, size_bytes, record_count, partition,
  *    has_deletion_vector), log-only ([[graft.sources.DeltaLog.filesTable]]).
  *
  * Each call materializes as a temp view at rewrite time (metadata-scale
  * for the inspection tables; the change feed plans lazily like any scan),
  * so the surrounding SQL composes freely — joins, filters, aggregates.
  */
object LakehouseTvf {

  private val Changes =
    """(?i)\btable_changes\s*\(\s*'([^']+)'\s*,\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)""".r
  private val Snaps = """(?i)\biceberg_snapshots\s*\(\s*'([^']+)'\s*\)""".r
  private val Refs = """(?i)\biceberg_refs\s*\(\s*'([^']+)'\s*\)""".r
  private val History = """(?i)\bdelta_history\s*\(\s*'([^']+)'\s*\)""".r
  private val Files = """(?i)\biceberg_files\s*\(\s*'([^']+)'\s*\)""".r
  private val Parts = """(?i)\biceberg_partitions\s*\(\s*'([^']+)'\s*\)""".r
  private val DFiles = """(?i)\bdelta_files\s*\(\s*'([^']+)'\s*\)""".r

  def rewrite(spark: SparkSession, sql: String): String = {
    val s1 = Changes.replaceAllIn(sql, m => {
      val path = m.group(1)
      val from = m.group(2).toLong
      val to = Option(m.group(3)).map(_.toLong)
      val view = "table_changes_" +
        math.abs((path, from, to).hashCode).toString
      graft.sources.DeltaLog.tableChanges(spark, path, from, to)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    val s2 = Snaps.replaceAllIn(s1, m => {
      val path = m.group(1)
      val view = "iceberg_snapshots_" + math.abs(path.hashCode).toString
      val se = spark
      import se.implicits._
      graft.sources.IcebergLog.snapshots(path)
        .map(s => (s.snapshotId, s.summary.getOrElse("operation", null),
          s.manifestList))
        .toDF("snapshot_id", "operation", "manifest_list")
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    val s3 = Refs.replaceAllIn(s2, m => {
      val path = m.group(1)
      val view = "iceberg_refs_" + math.abs(path.hashCode).toString
      val se = spark
      import se.implicits._
      graft.sources.IcebergLog.refs(path).toSeq.sortBy(_._1)
        .map { case (n, (sid, t)) => (n, sid, t) }
        .toDF("name", "snapshot_id", "type")
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    val s4 = History.replaceAllIn(s3, m => {
      val path = m.group(1)
      val view = "delta_history_" + math.abs(path.hashCode).toString
      graft.sources.DeltaLog.history(spark, path)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    val s5 = Files.replaceAllIn(s4, m => {
      val path = m.group(1)
      val view = "iceberg_files_" + math.abs(path.hashCode).toString
      graft.sources.IcebergLog.filesTable(spark, path)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    val s6 = Parts.replaceAllIn(s5, m => {
      val path = m.group(1)
      val view = "iceberg_partitions_" + math.abs(path.hashCode).toString
      graft.sources.IcebergLog.partitionsTable(spark, path)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
    DFiles.replaceAllIn(s6, m => {
      val path = m.group(1)
      val view = "delta_files_" + math.abs(path.hashCode).toString
      graft.sources.DeltaLog.filesTable(spark, path)
        .createOrReplaceTempView(view)
      scala.util.matching.Regex.quoteReplacement(view)
    })
  }
}
