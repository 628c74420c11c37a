package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext => EC, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Driver-run benchmark: headline queries at SPARK_GRAFT_SF_DIR, one JSON
  * line on stdout. Results are fully materialized through a noop sink (so
  * projections/aggregations aren't pruned by a count-only action).
  *
  * Methodology matches the reference's `--bench` (default 10 iterations,
  * stats over warm runs — `crates/datafusion-app/src/config.rs:131-133`,
  * `local.rs:365-504`): each query runs `SPARK_GRAFT_ITERS` times (default
  * 3) and reports the minimum, excluding one-time plan/codegen compilation
  * from the steady-state number.
  *
  * Isolation between entries: Spark's DataFrame cache is cleared before
  * every run (no cached intermediates carry between runs), and a System.gc()
  * after each query gives the ContextCleaner a chance to reclaim the
  * broadcasts/shuffle state of everything before it — late-list queries
  * otherwise pay the accumulated GC debt of the whole list. (The round-3
  * d03/d02 "regression" was environmental on top of that: stale sbt/Spark
  * JVMs from earlier sessions sharing the 32 CPUs. Min-of-3 plus isolation
  * makes a single noisy run stop defining the number.)
  *
  * A second section measures CONCURRENT throughput (the reference's
  * `--bench --concurrent` mode, `local.rs:422-431`). The reference measures
  * concurrency on a session that has NOT just executed the whole serial
  * list; r7 proved best-of-3 batches cannot recover from a sticky-degraded
  * driver (all three q01 batches drew the bad mode). So by default the
  * concurrent section runs in a FORKED FRESH JVM (same flags/classpath,
  * `SPARK_GRAFT_SECTION=concurrent`) after the serial session is stopped —
  * no residual codegen cache, cleaner backlog, or scheduler state from the
  * serial list. The JSON records `concurrent_isolated` so an inline
  * fallback (fork failure) is attributable on sight. Progress prints go to
  * stderr with a `[bench-info]` prefix — sbt tags all stderr `[error]`,
  * and the distinct prefix keeps harness chatter from reading as failures
  * in the artifact tail.
  */
object Bench {

  /** 1-minute system load average (or -1 where the JVM can't see it). */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  private def info(msg: String): Unit = System.err.println(s"[bench-info] $msg")

  /** Count of java processes that are NOT this benchmark (not self, not an
    * ancestor like the sbt launcher, not our own forked concurrent child).
    * Stale JVMs sharing the CPUs are the documented cause of previous
    * rounds' phantom regressions — recording the count makes any drift
    * attributable on sight.
    */
  private def foreignJvms(): Int = {
    import scala.jdk.StreamConverters._
    val self = ProcessHandle.current()
    // ancestor pids of this process (self, sbt, its shell's java wrappers)
    val related = scala.collection.mutable.Set(self.pid())
    var cur = self.parent()
    while (cur.isPresent) { related += cur.get.pid(); cur = cur.get.parent() }
    // descendants (the forked concurrent section, if alive)
    self.descendants().toScala(Iterator).foreach(h => related += h.pid())
    ProcessHandle.allProcesses().toScala(Iterator).count { h =>
      !related.contains(h.pid()) &&
        h.info().command().map[Boolean](_.contains("java")).orElse(false)
    }
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.isEmpty) -1.0
    else if (s.length % 2 == 1) s(s.length / 2)
    else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
  }

  private def buildSession(cpus: String): SparkSession = {
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
    spark
  }

  /** Concurrent throughput: N parallel materializations of the same query
    * over a fixed worker pool, queries/sec over wall time, best of
    * `SPARK_GRAFT_CONCURRENT_BATCHES` under a per-query time budget.
    */
  private def runConcurrent(spark: SparkSession, sfDir: String,
      cpus: Int): Seq[(String, Double)] = {
    val concNames = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_QUERIES",
      "q01_pricing_summary,q06_revenue_forecast,a01_ann_bruteforce")
      .split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
    val concIters = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_ITERS", "8").toInt
    val concBatches = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_BATCHES", "3").toInt
    val warmups = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_WARMUPS", "2").toInt
    val workers = math.min(concIters, cpus)
    concNames.map { name =>
      val fn = SparkEntry.queries(name)
      // serial warm-ups first: the isolated fresh JVM starts cold, and a
      // cold first batch is 32 threads of interpreted generated code
      // fighting the C2 queue — it measures the JIT, not the engine
      // (measured: cold concurrent q01 1.7 q/s vs ~7 warm). Two serial
      // runs compile the plan's codegen classes once, quietly.
      (1 to warmups).foreach { _ =>
        spark.catalog.clearCache()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
      // best-of-N batches, mirroring the serial min-of-N. A per-query time
      // budget bounds the pathological case: at least one batch always
      // runs, further batches only while under budget.
      val budgetNanos = sys.env
        .getOrElse("SPARK_GRAFT_CONCURRENT_BUDGET_SECS", "120").toLong * 1000000000L
      val tq0 = System.nanoTime()
      var best = Double.MinValue
      var b = 1
      // imperative loop: the budget must be checked AFTER each batch runs,
      // not eagerly over the whole range
      while (b <= concBatches &&
          (b == 1 || System.nanoTime() - tq0 < budgetNanos)) {
        info(s"concurrent $name batch $b")
        spark.catalog.clearCache()
        val pool = Executors.newFixedThreadPool(workers)
        implicit val ec: EC = EC.fromExecutor(pool)
        val t0 = System.nanoTime()
        val qps = try {
          Await.result(
            Future.sequence((1 to concIters).map(_ => Future {
              fn(spark, sfDir).write.mode("overwrite").format("noop").save()
            })), Duration.Inf)
          concIters / ((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          info(s"concurrent $name failed: ${e.getMessage}")
          -1.0
        } finally pool.shutdown()
        spark.catalog.clearCache()
        System.gc()
        if (qps > best) best = qps
        b += 1
      }
      name -> best
    }
  }

  private def concJson(rows: Seq[(String, Double)], concIters: Int,
      workers: Int): String = {
    val cs = rows.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    s""""concurrent_qps":$cs,"concurrent_iters":$concIters,"concurrent_workers":$workers"""
  }

  /** Fork a fresh JVM (same flags + classpath) running ONLY the concurrent
    * section, and return its `"concurrent_qps":... ` JSON fragment. The
    * child inherits this process's environment with
    * `SPARK_GRAFT_SECTION=concurrent`; its stderr passes through, its
    * stdout carries one fragment line.
    */
  private def forkConcurrent(): Option[String] = {
    try {
      import scala.jdk.CollectionConverters._
      val javaBin = java.nio.file.Paths
        .get(sys.props("java.home"), "bin", "java").toString
      val jvmArgs = java.lang.management.ManagementFactory
        .getRuntimeMXBean.getInputArguments.asScala.toSeq
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", sys.props("java.class.path"), "graft.Bench")
      val pb = new ProcessBuilder(cmd.asJava)
      pb.environment().put("SPARK_GRAFT_SECTION", "concurrent")
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val p = pb.start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      val code = p.waitFor()
      val frag = out.linesIterator
        .find(_.startsWith("{\"concurrent_qps\""))
        .map(_.stripPrefix("{").stripSuffix("}"))
      if (code != 0 || frag.isEmpty) {
        info(s"concurrent fork exited $code without a fragment — falling back inline")
        None
      } else frag
    } catch { case e: Throwable =>
      info(s"concurrent fork failed (${e.getMessage}) — falling back inline")
      None
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // all = serial + forked concurrent; serial = serial only;
    // concurrent = concurrent only, fragment output (the forked child)
    val section = sys.env.getOrElse("SPARK_GRAFT_SECTION", "all")
    val concIters = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_ITERS", "8").toInt
    val workers = math.min(concIters, cpus.toInt)

    if (section == "concurrent") {
      // forked child: wait for the parent's serial run to drain out of the
      // 1-minute loadavg before measuring. Concurrent throughput of
      // sub-second queries is acutely floor-sensitive — measured q01 at
      // 1.1 q/s starting on loadavg ~3.8 (right after the serial list),
      // 4.1 at 2.3, and 5.6 at 0.4 on the identical fresh JVM — so the
      // settle gate, not the fork alone, is what makes the number
      // reproducible. Bounded wait: loadavg decays with a ~60 s time
      // constant, so 240 s covers any serial-section residue.
      val maxLoad = sys.env.getOrElse("SPARK_GRAFT_MAX_LOAD", "2.0").toDouble
      val settleDeadline = System.nanoTime() +
        sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_LOAD_WAIT_SECS", "240").toLong * 1000000000L
      while (loadAvg() > maxLoad && System.nanoTime() < settleDeadline) {
        info(f"concurrent section waiting out residual load ${loadAvg()}%.2f > $maxLoad%.1f")
        Thread.sleep(10000)
      }
      val spark = buildSession(cpus)
      Thread.sleep(
        sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_SETTLE_MS", "4000").toLong)
      val rows = runConcurrent(spark, sfDir, cpus.toInt)
      println("{" + concJson(rows, concIters, workers) + "}")
      spark.stop()
      return
    }

    // Ambient-load gate (reference treats cross-run consistency as
    // first-class, `local_benchmarks.rs:169-185`): a benchmark started on a
    // busy machine measures the machine, not the engine — round 6's numbers
    // were contaminated by a pre-run load of 4.95 on this 32-core box.
    // Before building the session, wait (up to SPARK_GRAFT_LOAD_WAIT_SECS,
    // default 600) for the 1-minute load to fall below
    // SPARK_GRAFT_MAX_LOAD (default 2.0); if it never does, run anyway but
    // stamp `"dirty":true` in the JSON so the artifact self-reports as
    // non-comparable.
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_MAX_LOAD", "2.0").toDouble
    val loadWaitSecs = sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_SECS", "600").toLong
    val gateDeadline = System.nanoTime() + loadWaitSecs * 1000000000L
    while (loadAvg() > maxLoad && System.nanoTime() < gateDeadline) {
      info(f"ambient load ${loadAvg()}%.2f > $maxLoad%.1f — waiting for a quiet machine")
      Thread.sleep(15000)
    }
    val dirty = loadAvg() > maxLoad
    if (dirty) info(
      f"WARNING: starting on a loaded machine (${loadAvg()}%.2f > $maxLoad%.1f after ${loadWaitSecs}s) — results stamped dirty:true")

    val spark = buildSession(cpus)
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt

    def materialize(name: String): Double = {
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable =>
        info(s"$name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // load evidence: ambient machine state before/after the run plus the
    // count of unrelated JVMs, so a drifted number is attributable on
    // sight (see round-3/4 phantom regressions from stale JVMs)
    val loadBefore = loadAvg()
    val jvmsBefore = foreignJvms()

    // SPARK_GRAFT_QUERIES narrows the list for targeted repro runs
    // (e.g. chasing one query's variance with SPARK_GRAFT_ITERS=5)
    val headline = sys.env.get("SPARK_GRAFT_QUERIES") match {
      case Some(qs) =>
        qs.split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
      case None => Registry.all.filter(_.headline).map(_.name)
    }
    // one warm-up to JIT the scan/codegen path before timing
    materialize(headline.head)
    val results = headline.map { n =>
      val runs = (1 to iters).map(_ => materialize(n))
      // reclaim this query's broadcasts/shuffles before the next entry
      spark.catalog.clearCache()
      System.gc()
      val failed = runs.contains(-1.0)
      (n, if (failed) -1.0 else runs.min, if (failed) -1.0 else median(runs))
    }
    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, _, m) => "\"" + k + f"\":$m%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum

    // Concurrent section: fork a FRESH JVM after stopping the serial
    // session (see scaladoc). Inline fallback keeps the old behavior and
    // stamps concurrent_isolated:false.
    val (concFragment, isolated) =
      if (section == "serial")
        (concJson(Seq.empty, concIters, workers), false)
      else {
        spark.stop()
        forkConcurrent() match {
          case Some(frag) => (frag, true)
          case None =>
            val s2 = buildSession(cpus)
            Thread.sleep(sys.env
              .getOrElse("SPARK_GRAFT_CONCURRENT_SETTLE_MS", "4000").toLong)
            val rows = runConcurrent(s2, sfDir, cpus.toInt)
            s2.stop()
            (concJson(rows, concIters, workers), false)
        }
      }

    val loadAfter = loadAvg()
    val jvmsAfter = foreignJvms()
    val env = f""""load_avg_before":$loadBefore%.2f,"load_avg_after":$loadAfter%.2f,"foreign_jvms_before":$jvmsBefore,"foreign_jvms_after":$jvmsAfter,"iters":$iters,"dirty":$dirty"""

    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_median":$qsMed,$env,$concFragment,"concurrent_isolated":$isolated,"sf":"$sfDir"}""")
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
