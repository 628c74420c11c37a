package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Driver-run benchmark: headline queries at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout. Results are fully materialized through a noop sink (so
  * projections/aggregations aren't pruned by a count-only action).
  *
  * Methodology matches the reference's `--bench` (default 10 iterations,
  * stats over warm runs — `crates/datafusion-app/src/config.rs:131-133`,
  * `local.rs:365-504`): each query runs `SPARK_GRAFT_ITERS` times (default
  * 2) and reports the minimum, excluding one-time plan/codegen compilation
  * from the steady-state number. Spark's DataFrame cache is cleared before
  * every run so each iteration pays the full pipeline — no cached
  * intermediates carry between runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("SPARK_GRAFT_AQE", "true")
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt

    def materialize(name: String): Double = {
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val headline = Registry.all.filter(_.headline).map(_.name)
    // one warm-up to JIT the scan/codegen path before timing
    materialize(headline.head)
    val results = headline.map { n =>
      val runs = (1 to iters).map(_ => materialize(n))
      n -> (if (runs.contains(-1.0)) -1.0 else runs.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
