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
    if (name == "events") loadEvents(spark, dir) else spark.read.parquet(path(dir, name))

  /** The events table carries a TIMESTAMP(NANOS) column, which Spark's
    * parquet reader rejects by default. Read nanos as raw longs and convert
    * to a microsecond TimestampType column (Spark's native precision).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions._
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Register every table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
