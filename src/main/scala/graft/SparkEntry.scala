package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Registry.byName("q05_local_supplier_volume").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    * `__SF_DIR__` placeholders (file-path oracles) resolve against the
    * driver's correctness scale factor by default; Verify re-resolves them
    * against its actual sfDir argument.
    */
  def oracleSql: Map[String, String] = oracleSqlFor("/root/testdata/sf0.01")

  def oracleSqlFor(sfDir: String): Map[String, String] =
    Registry.all
      .flatMap(q => q.oracle.map(o => q.name -> o.trim.replace("__SF_DIR__", sfDir)))
      .toMap
}
