package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.exec.ExecutionContext

/** Oracle-checked CSV / NDJSON scan + writer round-trips (reference
  * registers both formats in its db dir walk, `src/db.rs:40-41`, and the
  * CLI writers emit them, `src/cli/mod.rs:779-844`). Each query writes a
  * TPC-H dimension table in the text format with Spark's distributed
  * writer, registers the directory back through the reference's
  * `CREATE EXTERNAL TABLE ... STORED AS fmt` DDL translation, scans it,
  * and the DuckDB oracle reads the very same files with its own
  * read_csv/read_ndjson — so the bytes on disk, not just the DataFrame,
  * are what's verified.
  *
  * Text formats carry no type metadata, so every non-string column is cast
  * explicitly on both sides (CSV reads back as strings; JSON as
  * bigint/double).
  */
object SourceQueries {

  // fixed absolute staging dir: the oracle SQL must name the same files
  // the Spark side wrote, regardless of either process's cwd
  private val stage = "/root/repo/target/xio"

  val queries: Seq[QueryDef] = Seq(

    QueryDef("x01_csv_scan", (s, d) => {
      val dir = s"$stage/nation_csv"
      Tables.load(s, d, "nation")
        .coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
      val ctx = new ExecutionContext(s)
      ctx.sql("DROP TABLE IF EXISTS x01_nation")
      ctx.runScript(s"CREATE EXTERNAL TABLE x01_nation STORED AS CSV LOCATION '$dir'")
      ctx.sql(
        """SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
          |  CAST(n_regionkey AS BIGINT) AS n_regionkey
          |FROM x01_nation ORDER BY n_nationkey""".stripMargin)
    }, Some(s"""
      SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
        CAST(n_regionkey AS BIGINT) AS n_regionkey
      FROM read_csv('$stage/nation_csv/*.csv', header=true)
      ORDER BY n_nationkey""")),

    QueryDef("x02_ndjson_scan", (s, d) => {
      val dir = s"$stage/supplier_json"
      Tables.load(s, d, "supplier")
        .coalesce(1).write.mode("overwrite").json(dir)
      val ctx = new ExecutionContext(s)
      ctx.sql("DROP TABLE IF EXISTS x02_supplier")
      ctx.runScript(s"CREATE EXTERNAL TABLE x02_supplier STORED AS NDJSON LOCATION '$dir'")
      ctx.sql(
        """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
          |  CAST(s_nationkey AS BIGINT) AS s_nationkey,
          |  CAST(s_acctbal AS DOUBLE) AS s_acctbal
          |FROM x02_supplier ORDER BY s_suppkey""".stripMargin)
    }, Some(s"""
      SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
        CAST(s_nationkey AS BIGINT) AS s_nationkey,
        CAST(s_acctbal AS DOUBLE) AS s_acctbal
      FROM read_ndjson('$stage/supplier_json/*.json')
      ORDER BY s_suppkey"""))
  )
}
