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

  private def sq(s: String): String = s.replace("'", "''")
}
