package graft.sources

import java.io.File
import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.server.MiniJson

/** Minimal read-only Delta Lake table support (reference registers a
  * `DELTATABLE` factory, `crates/datafusion-app/src/extensions/deltalake.rs:
  * 36-52`; exercised by `tests/extension_cases/deltalake.rs:23-44`).
  *
  * A Delta table is parquet data files plus a `_delta_log` of JSON commits
  * (one action object per line: `add`, `remove`, `metaData`, `protocol`,
  * `commitInfo`) and optional parquet checkpoints. Reading the current
  * snapshot is: start from the latest checkpoint's file list if one exists,
  * replay the JSON commits after it in version order applying add/remove by
  * path, then scan the surviving parquet files.
  *
  * Scale posture: the log is METADATA — kilobytes of JSON per commit and a
  * checkpoint parquet that is tiny relative to the table — so replaying it
  * on the driver is the same driver-side listing cost every Delta reader
  * pays. The data files themselves are never listed or touched here; they
  * flow into a normal distributed parquet scan, keeping pushdown, pruning
  * and split planning intact.
  */
object DeltaLog {

  /** A live data file: absolute path plus the partition values the log
    * assigns it (partition column data lives in the log, not the parquet).
    */
  final case class LiveFile(path: String, partitionValues: Map[String, String])

  /** Current snapshot: the live data files in first-added order. */
  def liveAdds(spark: SparkSession, tablePath: String): Seq[LiveFile] = {
    val root = new File(tablePath)
    val logDir = new File(root, "_delta_log")
    require(logDir.isDirectory,
      s"not a Delta table (no _delta_log): $tablePath")

    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("""\d{20}\.json"""))
      .sortBy(_.getName)

    // seed from the newest checkpoint at or below the newest commit, if any
    val checkpointVersion = lastCheckpointVersion(logDir)
    val live = mutable.LinkedHashMap.empty[String, Map[String, String]]
    checkpointVersion.foreach { v =>
      val cp = new File(logDir, f"$v%020d.checkpoint.parquet")
      require(cp.isFile, s"_last_checkpoint names a missing file: $cp")
      // the checkpoint is a parquet table of the same actions; only rows
      // with a non-null `add` carry live files
      val cpDf = spark.read.parquet(cp.getPath).where("add IS NOT NULL")
      val hasPv = cpDf.schema("add").dataType match {
        case t: org.apache.spark.sql.types.StructType =>
          t.fieldNames.contains("partitionValues")
        case _ => false
      }
      val rows =
        if (hasPv) cpDf.selectExpr("add.path", "add.partitionValues").collect()
        else cpDf.selectExpr("add.path", "map() AS pv").collect()
      rows.foreach { r =>
        val pv = Option(r.getMap[String, String](1))
          .map(_.toMap).getOrElse(Map.empty)
        live += r.getString(0) -> pv
      }
    }

    commits
      .filter(f => checkpointVersion.forall(_ < versionOf(f)))
      .foreach { f =>
        Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
          .filter(_.trim.nonEmpty)
          .foreach { line =>
            val action = MiniJson.parseObject(line).getOrElse(
              throw new IllegalArgumentException(
                s"unparseable Delta action in ${f.getName}: $line"))
            action.get("add") match {
              case Some(m: Map[_, _]) =>
                val a = m.asInstanceOf[Map[String, Any]]
                val pv = a.get("partitionValues") match {
                  case Some(pm: Map[_, _]) =>
                    pm.asInstanceOf[Map[String, Any]].collect {
                      case (k, v: String) => k -> v
                    }
                  case _ => Map.empty[String, String]
                }
                live += pathOf(a, f) -> pv
              case _ =>
            }
            action.get("remove") match {
              case Some(m: Map[_, _]) =>
                live -= pathOf(m.asInstanceOf[Map[String, Any]], f)
              case _ =>
            }
          }
      }

    live.toSeq.map { case (rel, pv) =>
      // paths are table-root-relative and URL-encoded per the protocol;
      // absolute URIs pass through
      val abs =
        if (rel.contains("://") || rel.startsWith("/")) rel
        else new File(root, URLDecoder.decode(rel, "UTF-8")).getPath
      LiveFile(abs, pv)
    }
  }

  /** Live data-file paths only (unpartitioned view of [[liveAdds]]). */
  def liveFiles(spark: SparkSession, tablePath: String): Seq[String] =
    liveAdds(spark, tablePath).map(_.path)

  /** Read the table's current snapshot as a DataFrame. Partition columns
    * come from the log's `partitionValues` (injected as string literal
    * columns, grouped so each distinct partition reads as one scan —
    * Delta stores them nowhere else). An empty table (all files removed)
    * still needs a schema, which without a live file only the `metaData`
    * action carries — out of scope for this reader, so it refuses rather
    * than guessing.
    */
  def read(spark: SparkSession, tablePath: String): DataFrame = {
    val adds = liveAdds(spark, tablePath)
    require(adds.nonEmpty, s"Delta table has no live files: $tablePath")
    import org.apache.spark.sql.functions.lit
    if (adds.forall(_.partitionValues.isEmpty))
      spark.read.parquet(adds.map(_.path): _*)
    else
      adds.groupBy(_.partitionValues).map { case (pv, group) =>
        pv.toSeq.sortBy(_._1).foldLeft(
          spark.read.parquet(group.map(_.path): _*)) {
          case (df, (k, v)) => df.withColumn(k, lit(v))
        }
      }.reduce(_ unionByName _)
  }

  /** Register the snapshot under `name` (the DDL entry point for
    * `CREATE EXTERNAL TABLE ... STORED AS DELTATABLE`).
    */
  def register(spark: SparkSession, name: String, tablePath: String): DataFrame = {
    read(spark, tablePath).createOrReplaceTempView(name)
    spark.emptyDataFrame
  }

  private def versionOf(f: File): Long =
    f.getName.stripSuffix(".json").toLong

  private def pathOf(action: Map[String, Any], f: File): String =
    action.get("path") match {
      case Some(p: String) => p
      case _ => throw new IllegalArgumentException(
        s"Delta action without a path in ${f.getName}")
    }

  /** `_last_checkpoint` is a one-line JSON `{"version": N, ...}`. */
  private def lastCheckpointVersion(logDir: File): Option[Long] = {
    val f = new File(logDir, "_last_checkpoint")
    if (!f.isFile) None
    else MiniJson.parseObject(
        new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8).trim)
      .flatMap(_.get("version"))
      .collect { case d: Double => d.toLong }
  }
}
