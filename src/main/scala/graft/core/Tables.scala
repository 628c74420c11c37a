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

  /** Normalize an events frame's `ts` column to Spark-native TimestampType
    * (microsecond UTC instant) whatever the file's physical encoding. The
    * driver-generated events parquet has shipped as BOTH TIMESTAMP(NANOS)
    * (which Spark reads as a raw long under `nanosAsLong`) and
    * TIMESTAMP_NTZ(micros) across rounds — an external table's writer owns
    * its encoding, not the engine. The reference gets this adaptivity free
    * from footer-inferred ListingTable schemas (reference `src/db.rs:134-137`);
    * branching on the loaded dataType is the Spark equivalent. Anything
    * unrecognized fails loudly with the offending type rather than
    * guessing a unit and silently corrupting every timestamp.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      case LongType => // TIMESTAMP(NANOS) read as raw nanos under nanosAsLong
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case TimestampNTZType =>
        // UTC session timezone everywhere in this engine, so the NTZ
        // wall-clock value IS the instant; the cast is value-preserving
        df.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalArgumentException(
        s"events.ts has unsupported physical type $other — expected INT64 " +
          "nanos (TIMESTAMP(NANOS) under nanosAsLong), TIMESTAMP, or TIMESTAMP_NTZ")
    }
  }

  /** Load the events table, adapting to whichever timestamp encoding the
    * current parquet carries (see [[normalizeEventTs]]).
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(path(dir, "events")))
  }

  /** Register every table as a temp view named after the table. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
