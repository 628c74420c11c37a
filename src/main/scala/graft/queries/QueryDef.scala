package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable query: a Spark DataFrame implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle statement
  * over the same parquet tables. Column names and value types must line up
  * exactly between the two (driver hashes values after sorting columns by
  * name), so every computed column is aliased identically on both sides.
  *
  * Determinism rules used throughout:
  *   - every query ends in a total ORDER BY (unique tie-break column);
  *   - double SUMs go through DECIMAL (exact, order-independent) and are cast
  *     back to DOUBLE at the end — bit-identical across engines;
  *   - integral outputs are cast to BIGINT on both sides (Spark ints vs
  *     DuckDB BIGINT/HUGEINT defaults differ).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)
