package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Dev utility: time individual registry queries (noop-materialized, same
  * session config as Bench) — `runMain graft.PerfProbe d02_ngram_jaccard
  * [more...]`. Each query runs twice; both timings print (first includes
  * plan/codegen warmup).
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = Registry.byName(name)
      (1 to 2).foreach { i =>
        spark.catalog.clearCache() // measure the full pipeline every run
        val t0 = System.nanoTime()
        fn.run(spark, sfDir).write.mode("overwrite").format("noop").save()
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
