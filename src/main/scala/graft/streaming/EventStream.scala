package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Structured Streaming over the events table. The reference is batch-only
  * (SURVEY §2.10) — this extends the engine for stream-shaped workloads the
  * testdata models: watermarked tumbling-window aggregation with late-data
  * tolerance, runnable over a growing parquet directory.
  */
object EventStream {

  /** Raw schema of the events parquet (ts is TIMESTAMP(NANOS), which Spark
    * reads as a long under nanosAsLong).
    */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source over a directory of event parquet files. */
  def source(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Watermarked hourly windowed aggregation per event type. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(12,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Run the hourly aggregation into an in-memory sink until the directory
    * is drained; returns the finished query (results under `queryName`).
    */
  def runToMemory(spark: SparkSession, dir: String,
      queryName: String): StreamingQuery = {
    val q = hourlyAgg(source(spark, dir))
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .start()
    q.processAllAvailable()
    q
  }

  /** Batch-equivalent of [[hourlyAgg]] for result parity checks. */
  def hourlyAggBatch(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    hourlyAgg(spark.read.schema(rawSchema).parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000"))))
  }
}
