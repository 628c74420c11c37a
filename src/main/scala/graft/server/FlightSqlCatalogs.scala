package graft.server

import org.apache.spark.sql.DataFrame

import graft.exec.ExecutionContext

/** FlightSQL catalog-endpoint semantics (reference
  * `src/server/flightsql/service.rs:251-485`): each Command is SQL over
  * information_schema with optional filters — exact catalog match, ILIKE
  * patterns for schema/table names, IN-list for table types — returning the
  * reference's column shapes (catalog_name, db_schema_name, table_name,
  * table_type).
  */
object FlightSqlCatalogs {

  /** CommandGetCatalogs (`service.rs:251-270`). */
  def getCatalogs(ctx: ExecutionContext): DataFrame =
    ctx.sql(
      """SELECT DISTINCT table_catalog AS catalog_name
        |FROM information_schema.tables ORDER BY catalog_name""".stripMargin)

  /** CommandGetDbSchemas (`service.rs:272-310`). */
  def getDbSchemas(ctx: ExecutionContext, catalog: Option[String] = None,
      schemaPattern: Option[String] = None): DataFrame = {
    val filters = Seq(
      catalog.map(c => s"table_catalog = '${sq(c)}'"),
      schemaPattern.map(p => s"table_schema ILIKE '${sq(p)}'")).flatten
    val where = if (filters.isEmpty) "" else filters.mkString("WHERE ", " AND ", "")
    ctx.sql(
      s"""SELECT DISTINCT table_catalog AS catalog_name,
         |  table_schema AS db_schema_name
         |FROM information_schema.tables $where
         |ORDER BY catalog_name, db_schema_name""".stripMargin)
  }

  /** CommandGetTables (`service.rs:312-390`). */
  def getTables(ctx: ExecutionContext, catalog: Option[String] = None,
      schemaPattern: Option[String] = None, tablePattern: Option[String] = None,
      tableTypes: Seq[String] = Seq.empty): DataFrame = {
    val filters = Seq(
      catalog.map(c => s"table_catalog = '${sq(c)}'"),
      schemaPattern.map(p => s"table_schema ILIKE '${sq(p)}'"),
      tablePattern.map(p => s"table_name ILIKE '${sq(p)}'"),
      if (tableTypes.isEmpty) None
      else Some(tableTypes.map(t => s"'${sq(t)}'").mkString("table_type IN (", ",", ")"))
    ).flatten
    val where = if (filters.isEmpty) "" else filters.mkString("WHERE ", " AND ", "")
    ctx.sql(
      s"""SELECT table_catalog AS catalog_name, table_schema AS db_schema_name,
         |  table_name, table_type
         |FROM information_schema.tables $where
         |ORDER BY catalog_name, db_schema_name, table_name""".stripMargin)
  }

  /** CommandGetTableTypes (`service.rs:392-410`). */
  def getTableTypes(ctx: ExecutionContext): DataFrame =
    ctx.sql(
      """SELECT DISTINCT table_type
        |FROM information_schema.tables ORDER BY table_type""".stripMargin)

  /** CommandGetSqlInfo (`service.rs:400-429`): the reference sidesteps the
    * DenseUnion SqlInfo schema and returns one basic server-info row via
    * SQL; same shape here (arrow version read from the bundled arrow-vector
    * jar's manifest, as the reference pins its arrow crate version).
    */
  def getSqlInfo(ctx: ExecutionContext): DataFrame = {
    val arrowVersion = Option(
      classOf[org.apache.arrow.vector.types.pojo.Schema]
        .getPackage.getImplementationVersion).getOrElse("unknown")
    ctx.sql(
      s"""SELECT 'graft' AS server_name,
         |  '${graft.tables.MetaTables.appVersion}' AS server_version,
         |  '$arrowVersion' AS arrow_version,
         |  false AS read_only""".stripMargin)
  }

  /** CommandGetXdbcTypeInfo (`service.rs:431-485`): static VALUES table of
    * the supported SQL types in the reference's 17-column XDBC shape, with
    * the optional `data_type` code filter.
    */
  def getXdbcTypeInfo(ctx: ExecutionContext, dataType: Option[Int] = None): DataFrame = {
    val filter = dataType.map(dt => s" WHERE data_type = $dt").getOrElse("")
    ctx.sql(
      s"""SELECT * FROM VALUES
         |  (-5, 'BIGINT', 19, NULL, NULL, NULL, 1, 0, 3, 0, 0, 0, 'BIGINT', -5, 0, 10, 0),
         |  (4, 'INTEGER', 10, NULL, NULL, NULL, 1, 0, 3, 0, 0, 0, 'INTEGER', 4, 0, 10, 0),
         |  (5, 'SMALLINT', 5, NULL, NULL, NULL, 1, 0, 3, 0, 0, 0, 'SMALLINT', 5, 0, 10, 0),
         |  (-6, 'TINYINT', 3, NULL, NULL, NULL, 1, 0, 3, 0, 0, 0, 'TINYINT', -6, 0, 10, 0),
         |  (8, 'DOUBLE', 15, NULL, NULL, NULL, 1, 0, 3, 0, 0, 0, 'DOUBLE PRECISION', 8, 0, 2, 0),
         |  (7, 'REAL', 7, NULL, NULL, NULL, 1, 0, 3, 0, 0, 0, 'REAL', 7, 0, 2, 0),
         |  (12, 'VARCHAR', 2147483647, "'", "'", 'length', 1, 1, 3, 0, 0, 0, 'VARCHAR', 12, 0, 0, 0),
         |  (91, 'DATE', 10, "'", "'", NULL, 1, 0, 3, 0, 0, 0, 'DATE', 91, 0, 0, 0),
         |  (93, 'TIMESTAMP', 23, "'", "'", NULL, 1, 0, 3, 0, 0, 0, 'TIMESTAMP', 93, 3, 0, 0),
         |  (-7, 'BOOLEAN', 1, NULL, NULL, NULL, 1, 0, 3, 0, 0, 0, 'BOOLEAN', -7, 0, 0, 0),
         |  (-2, 'BINARY', 2147483647, "'", "'", 'length', 1, 0, 3, 0, 0, 0, 'BINARY', -2, 0, 0, 0),
         |  (2, 'DECIMAL', 38, NULL, NULL, 'precision,scale', 1, 0, 3, 0, 0, 0, 'DECIMAL', 2, 0, 10, 0)
         |  AS types(type_name_num, type_name_str, column_size, literal_prefix,
         |    literal_suffix, create_params, nullable, case_sensitive, searchable,
         |    unsigned_attribute, fixed_prec_scale, auto_increment, local_type_name,
         |    data_type, minimum_scale, maximum_scale, sql_datetime_sub)$filter""".stripMargin)
  }

  private def sq(s: String): String = s.replace("'", "''")
}
