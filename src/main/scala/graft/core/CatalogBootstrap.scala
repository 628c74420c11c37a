package graft.core

import java.io.File

import org.apache.spark.sql.SparkSession

/** Database-directory bootstrap (reference `src/db.rs:54-150`, `docs/db.md`):
  * walk `dbDir/tables/<catalog>/<schema>/<table>/<files>` and register each
  * leaf directory as a table, format detected from the first file extension
  * (parquet/csv/json).
  *
  * Divergence note: Spark's session catalog is two-level (database.table),
  * so `<catalog>.<schema>.<table>` registers as database `<catalog>_<schema>`
  * and table `<table>`; a flat temp view `<catalog>_<schema>_<table>` is also
  * created. `SHOW TABLES IN <catalog>_<schema>` mirrors the reference's
  * information_schema listing.
  */
object CatalogBootstrap {

  final case class RegisteredTable(catalog: String, schema: String,
      table: String, format: String, path: String)

  def registerDbDir(spark: SparkSession, dbDir: String): Seq[RegisteredTable] = {
    val tablesRoot = new File(dbDir, "tables")
    if (!tablesRoot.isDirectory) return Seq.empty
    val registered = for {
      catalog <- sorted(tablesRoot)
      schema <- sorted(catalog)
      table <- sorted(schema)
      fmt <- detectFormat(table)
    } yield {
      val db = s"${catalog.getName}_${schema.getName}"
      if (fmt == "delta") {
        // Delta snapshots read a log-derived file list, which Spark DDL
        // can't express as a single LOCATION — register the flat temp view
        // only (the information_schema overlay still lists the 3-level
        // identity)
        graft.sources.DeltaLog.register(spark,
          s"${db}_${table.getName}", table.getAbsolutePath)
      } else if (fmt == "avro") {
        // Avro reads through the avro-mapred bridge, not a Spark USING
        // format (spark-avro is absent offline) — temp-view registration,
        // same pattern as Delta
        graft.sources.AvroIO.register(spark,
          s"${db}_${table.getName}", table.getAbsolutePath)
      } else {
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
        spark.sql(s"DROP TABLE IF EXISTS `$db`.`${table.getName}`")
        spark.sql(
          s"""CREATE TABLE `$db`.`${table.getName}`
             |USING $fmt
             |${if (fmt == "csv") "OPTIONS (header 'true')" else ""}
             |LOCATION '${table.getAbsolutePath}'""".stripMargin)
        val df = spark.table(s"`$db`.`${table.getName}`")
        df.createOrReplaceTempView(s"${db}_${table.getName}")
      }
      RegisteredTable(catalog.getName, schema.getName, table.getName, fmt,
        table.getAbsolutePath)
    }
    registerInformationSchema(spark, registered)
    registered
  }

  /** Contribute the db-dir tables to the synthesized information_schema
    * under their reference 3-level identity (the reference always enables
    * information_schema — `extensions/builder.rs:82,100-102`); the
    * flattened session-catalog duplicates are hidden from listings.
    */
  def registerInformationSchema(spark: SparkSession,
      tables: Seq[RegisteredTable]): Unit =
    InformationSchema.setOverlay(spark,
      tables.map(t => (t.catalog, t.schema, t.table, "BASE TABLE")))

  private def sorted(dir: File): Seq[File] =
    Option(dir.listFiles).map(_.filter(_.isDirectory).sortBy(_.getName).toSeq)
      .getOrElse(Seq.empty)

  private def detectFormat(tableDir: File): Option[String] = {
    // a _delta_log subdirectory marks a Delta table (its parquet files must
    // NOT be registered as a plain parquet dir: removed files would
    // resurface)
    if (new File(tableDir, "_delta_log").isDirectory) return Some("delta")
    val files = Option(tableDir.listFiles)
      .map(_.filter(_.isFile).sortBy(_.getName).toSeq).getOrElse(Seq.empty)
    files.iterator.map(_.getName.split('.').last.toLowerCase).collectFirst {
      case "parquet" => "parquet"
      case "csv" => "csv"
      case "json" => "json"
      case "ndjson" => "json"
      case "avro" => "avro" // beyond-reference (db.rs detects 4 formats)
    }
  }
}
