package graft.exec

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext => EC, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

/** `--bench` instrumentation (reference `local.rs:365-504`,
  * `local_benchmarks.rs:76-214`): N iterations (default 10), serial or
  * concurrent (`min(iterations, cores)` workers), per-phase duration stats
  * (min/max/mean/median/percent-of-total), row-count consistency check, and
  * CSV export matching the reference's header shape.
  *
  * Phase mapping on Spark's lazy QueryExecution (SURVEY §7.4):
  *   logical planning  = parse + analyze + optimize (`df.queryExecution.optimizedPlan`)
  *   physical planning = `executedPlan`
  *   execution         = action (collect-to-count via noop materialization)
  */
object BenchmarkRunner {

  final case class PhaseStats(min: Double, max: Double, mean: Double,
      median: Double, percentOfTotal: Double) {
    def csvFields: String = f"$min%.3f,$max%.3f,$mean%.3f,$median%.3f,$percentOfTotal%.1f"
  }

  final case class BenchResult(query: String, runs: Int, mode: String,
      logical: PhaseStats, physical: PhaseStats, execution: PhaseStats,
      total: PhaseStats, rowCounts: Seq[Long]) {
    def rowCountsConsistent: Boolean = rowCounts.distinct.size <= 1

    /** CSV row; header shape mirrors the reference
      * (`src/cli/mod.rs:59-60`).
      */
    def csvRow: String =
      s"$query,$runs,${logical.csvFields},${physical.csvFields}," +
        s"${execution.csvFields},${total.csvFields},$mode"

    def summary: String = {
      def line(n: String, p: PhaseStats) =
        f"  $n%-18s min ${p.min}%9.3fms  max ${p.max}%9.3fms  mean ${p.mean}%9.3fms  median ${p.median}%9.3fms  ${p.percentOfTotal}%5.1f%%"
      s"""Benchmark Stats ($runs runs, $mode)
         |${line("logical planning", logical)}
         |${line("physical planning", physical)}
         |${line("execution", execution)}
         |${line("total", total)}
         |  row counts: ${if (rowCountsConsistent) s"consistent (${rowCounts.headOption.getOrElse(0L)})" else s"INCONSISTENT ${rowCounts.mkString(",")}"}""".stripMargin
    }
  }

  val csvHeader: String = {
    val phases = Seq("logical_planning", "physical_planning", "execution", "total")
    "query,runs," + phases.map(p =>
      s"${p}_min,${p}_max,${p}_mean,${p}_median,${p}_percent_of_total")
      .mkString(",") + ",concurrency_mode"
  }

  private def stats(xs: Seq[Double], totalMean: Double): PhaseStats = {
    val sorted = xs.sorted
    val mean = xs.sum / xs.size
    val median =
      if (sorted.size % 2 == 1) sorted(sorted.size / 2)
      else (sorted(sorted.size / 2 - 1) + sorted(sorted.size / 2)) / 2.0
    PhaseStats(sorted.head, sorted.last, mean, median,
      if (totalMean == 0) 0 else mean / totalMean * 100.0)
  }

  private def timeOnce(spark: SparkSession, sql: String): (Double, Double, Double, Long) = {
    def ms(t0: Long) = (System.nanoTime() - t0) / 1e6
    val t0 = System.nanoTime()
    val df = spark.sql(sql) // parse + analyze
    val qe = df.queryExecution
    qe.optimizedPlan // optimize
    val logical = ms(t0)
    val t1 = System.nanoTime()
    qe.executedPlan // physical planning
    val physical = ms(t1)
    val t2 = System.nanoTime()
    // Full materialization: toRdd.count() executes the physical plan with
    // every output column computed (df.count() would let Catalyst prune the
    // projections and under-measure execution).
    val rows = qe.toRdd.count()
    val execution = ms(t2)
    (logical, physical, execution, rows)
  }

  /** Run the benchmark. `runBefore` is the optional warm-up statement
    * (reference `--run-before`).
    */
  def run(spark: SparkSession, sql: String, iterations: Int = 10,
      concurrent: Boolean = false, runBefore: Option[String] = None): BenchResult = {
    runBefore.foreach(s => spark.sql(s).queryExecution.toRdd.count())
    val results =
      if (!concurrent) (1 to iterations).map(_ => timeOnce(spark, sql))
      else {
        val workers = math.min(iterations, Runtime.getRuntime.availableProcessors)
        val pool = Executors.newFixedThreadPool(workers)
        implicit val ec: EC = EC.fromExecutor(pool)
        try Await.result(
          Future.sequence((1 to iterations).map(_ => Future(timeOnce(spark, sql)))),
          Duration.Inf)
        finally pool.shutdown()
      }
    val (logical, physical, execution) =
      (results.map(_._1), results.map(_._2), results.map(_._3))
    val totals = results.map(r => r._1 + r._2 + r._3)
    val totalMean = totals.sum / totals.size
    BenchResult(sql.replace('\n', ' ').take(80), iterations,
      if (concurrent) "concurrent" else "serial",
      stats(logical, totalMean), stats(physical, totalMean),
      stats(execution, totalMean), stats(totals, totalMean),
      results.map(_._4))
  }
}
