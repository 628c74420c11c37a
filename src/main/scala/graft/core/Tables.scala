package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry over the parquet testdata layout (TESTDATA.md): one parquet file
  * per table under a scale-factor directory. Mirrors the reference's
  * directory-walk table registration (reference `src/db.rs:54-150`) in the
  * idiomatic Spark way: `spark.read.parquet` + temp views, schema inferred
  * from footers at registration time.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Register every table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
