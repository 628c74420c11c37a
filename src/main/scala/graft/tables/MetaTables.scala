package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Metadata tables (reference `crates/datafusion-app/src/catalog/mod.rs:47-68`
  * `dft.meta.versions`): a one-row version table registered at session start.
  */
object MetaTables {
  val appVersion = "0.1.0"

  def versions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq((appVersion, spark.version, "graft"))
      .toDF("graft_spark", "spark", "engine")
  }

  def register(spark: SparkSession): Unit =
    versions(spark).createOrReplaceTempView("meta_versions")
}
