package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.ParquetMetadataTable

/** Metadata/introspection queries. The parquet_metadata oracle uses
  * DuckDB's built-in parquet_metadata() (the reference's 24-column schema
  * mirrors it); only representation-stable columns are compared — stats
  * rendering, logical-type names and encoding lists are engine-specific
  * strings.
  *
  * The oracle's file path is the `__SF_DIR__` placeholder, substituted with
  * the actual scale-factor directory at dump time (Verify) so Spark and
  * DuckDB always describe the same physical file.
  */
object MetaQueries {

  val queries: Seq[QueryDef] = Seq(
    QueryDef("p01_parquet_metadata", (s, d) =>
      ParquetMetadataTable(s, s"$d/region.parquet")
        .select(
          element_at(split(col("filename"), "/"), -1).as("file_name"),
          col("row_group_id"), col("row_group_num_rows"),
          col("row_group_num_columns"), col("column_id"),
          col("path_in_schema"), col("num_values"),
          col("stats_null_count"), col("total_compressed_size"),
          col("total_uncompressed_size"))
        .orderBy(col("row_group_id"), col("column_id")),
      Some("""
      SELECT regexp_extract(file_name, '([^/]+)$', 1) AS file_name,
        row_group_id, row_group_num_rows, row_group_num_columns, column_id,
        path_in_schema, num_values, stats_null_count,
        total_compressed_size, total_uncompressed_size
      FROM parquet_metadata('__SF_DIR__/region.parquet')
      ORDER BY row_group_id, column_id"""))
  )
}
