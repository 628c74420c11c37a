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
  * fallback (fork failure) is attributable on sight. Progress and verbose
  * forensics go to `SPARK_GRAFT_BENCH_LOG` (default /tmp/graft-bench.log)
  * — see `logPath`; stdout carries only the two final JSON lines.
  */
object Bench {

  /** 1-minute system load average (or -1 where the JVM can't see it). */
  private def loadAvg(): Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  /** Progress and verbose forensics go to a LOG FILE, not stdout. The
    * r16 artifact was truncated mid-summary-line (`parsed:null`, tail
    * ends at `"concurr`): the driver's output capture is bounded, and a
    * run that prints more than the bound loses its FINAL lines — the
    * summary itself. The only defense is total stdout volume, so stdout
    * now carries exactly two JSON lines (a `{"runs":...}` forensics line
    * and the `{"metric":"summary"...}` line, printed last); everything
    * else — progress, the verbose per-query forensics, the concurrent
    * batch detail — appends here. The file also survives for post-run
    * bisects without a rerun.
    */
  private lazy val logPath: String = {
    val p = sys.env.getOrElse("SPARK_GRAFT_BENCH_LOG", "/tmp/graft-bench.log")
    try { new java.io.File(p).getParentFile match {
      case null => (); case d => { d.mkdirs(); () } } } catch { case _: Throwable => () }
    p
  }
  private def info(msg: String): Unit = synchronized {
    try {
      val w = new java.io.FileWriter(logPath, true)
      try w.write(s"[bench-info] $msg\n") finally w.close()
    } catch { case _: Throwable => Console.err.println(s"[bench-info] $msg") }
  }

  // ---- per-run forensics: the r9 A/B (identical bytecode, every query
  // 10-49% faster, total 25.14→17.50 s) proved session-level floor swings
  // the artifact could not attribute. Each reported number now carries the
  // ambient load it was measured under plus this JVM's own procCpu / JIT /
  // GC deltas, so a reader can split floor noise from regression in the
  // artifact itself.
  private val osBean = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.asInstanceOf[com.sun.management.OperatingSystemMXBean]
  private def jitTotalMs(): Long = java.lang.management.ManagementFactory
    .getCompilationMXBean.getTotalCompilationTime
  private def gcTotalMs(): Long = {
    var t = 0L
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .forEach(b => t += math.max(b.getCollectionTime, 0L))
    t
  }

  /** Machine-wide busy jiffies (USER_HZ = 100) from /proc/stat line 1 —
    * user+nice+system+irq+softirq+steal, excluding idle and iowait.
    * Subtracting this process's own CPU delta yields FOREIGN CPU: the
    * attribution loadavg cannot give (the 1-min average folds our own
    * 32-thread bursts into the same number as a live competitor — the
    * r16 "load 2.3–3.6 under dirty:false" ambiguity).
    */
  private def busyJiffies(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        f.zipWithIndex.collect { case (v, i) if i != 3 && i != 4 => v }.sum
      } finally src.close()
    } catch { case _: Throwable => -1L }

  /** Forensic deltas for one measured run. `fcores` = average CPU cores
    * used by processes OTHER than this JVM during the run (−1 where
    * /proc/stat is unreadable) — the per-run dirty signal.
    */
  final case class RunForensics(load: Double, procCpu: Double, jitMs: Long,
      gcMs: Long, fcores: Double) {
    def json: String =
      f"""{"load":$load%.2f,"proc_cpu":$procCpu%.2f,"jit_ms":$jitMs,"gc_ms":$gcMs,"fcores":$fcores%.2f}"""
  }

  private def measure[A](body: => A): (Double, RunForensics, A) = {
    val load0 = loadAvg()
    val cpu0 = osBean.getProcessCpuTime
    val jit0 = jitTotalMs()
    val gc0 = gcTotalMs()
    val busy0 = busyJiffies()
    val t0 = System.nanoTime()
    val a = body
    val secs = (System.nanoTime() - t0) / 1e9
    val fcores =
      if (busy0 < 0) -1.0
      else math.max(0.0, (busyJiffies() - busy0) / 100.0 -
        (osBean.getProcessCpuTime - cpu0) / 1e9) / math.max(secs, 1e-9)
    (secs, RunForensics(load0, (osBean.getProcessCpuTime - cpu0) / 1e9,
      jitTotalMs() - jit0, gcTotalMs() - gc0, fcores), a)
  }

  /** Ambient-load settle gate. The old gate was a single ≤2.0 snapshot —
    * r9 proved it anti-correlates (load 1.64 start produced the best-ever
    * numbers: the 1.64 was decaying residue of a finished process, not a
    * live competitor). The gate now accepts when either
    *   (a) load ≤ `maxLoad` (default 0.7 — genuinely idle), or
    *   (b) load ≤ `hardCap` AND the last 4 samples are strictly decaying
    *       ≥10%% overall (finished-process residue: the 1-min average lags
    *       the actually-idle CPUs, safe to start).
    * Steady load above `maxLoad` that never decays is a live competitor →
    * wait out the deadline, then run stamped dirty. Returns (dirty,
    * sampled trajectory) so the artifact records what the gate saw.
    */
  private def settleGate(maxLoad: Double, hardCap: Double, waitSecs: Long,
      tag: String): (Boolean, Seq[Double]) = {
    val deadline = System.nanoTime() + waitSecs * 1000000000L
    val samples = scala.collection.mutable.ArrayBuffer(loadAvg())
    def decaying: Boolean = samples.length >= 4 && {
      val w = samples.takeRight(4)
      w.sliding(2).forall(p => p(1) < p(0) - 0.005) && w.last <= 0.9 * w.head
    }
    while (System.nanoTime() < deadline && samples.last > maxLoad &&
        !(samples.last <= hardCap && decaying)) {
      info(f"$tag waiting: load ${samples.last}%.2f > $maxLoad%.1f and not decaying")
      Thread.sleep(15000)
      samples += loadAvg()
    }
    val clean = samples.last <= maxLoad || (samples.last <= hardCap && decaying)
    (!clean, samples.toSeq)
  }

  private def trajJson(samples: Seq[Double]): String =
    samples.takeRight(8).map(l => f"$l%.2f").mkString("[", ",", "]")

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
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.adaptive.coalescePartitions.enabled", aqe)
      .config("spark.ui.enabled", "false")
    // forensic A/B knob: `SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2"` applies
    // arbitrary session confs to a repro run (e.g. flipping
    // spark.sql.codegen.wholeStage to separate codegen-JIT cost from
    // engine throughput) without a code change per experiment
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k.trim, v.trim)
      })
    val spark = builder.getOrCreate()
    // ERROR, not WARN: runtime warnings land on stdout via the sbt fork
    // and count against the driver's bounded output capture — the bench
    // JSON must never compete with log chatter for the kept window
    spark.sparkContext.setLogLevel("ERROR")
    spark
  }

  /** Concurrent throughput: N parallel materializations of the same query
    * over a fixed worker pool, queries/sec over wall time, best of
    * `SPARK_GRAFT_CONCURRENT_BATCHES` under a per-query time budget.
    */
  /** One concurrent batch's forensics: observed q/s plus the ambient load
    * it started under and the JVM's own cpu/jit/gc deltas — the per-batch
    * evidence five rounds of near-miss q01 numbers lacked.
    */
  private final case class BatchStats(qps: Double, f: RunForensics) {
    def json: String =
      f"""{"qps":$qps%.3f,"load":${f.load}%.2f,"proc_cpu":${f.procCpu}%.2f,"jit_ms":${f.jitMs},"gc_ms":${f.gcMs},"fcores":${f.fcores}%.2f}"""
    /** `[qps, load_at_start, foreign_cores, jit_ms, gc_ms]` — compact
      * enough that EVERY batch of EVERY entry fits inside the summary
      * line the driver's 2 KB tail is guaranteed to keep (the r16
      * q01_multirg contradiction was undiagnosable precisely because
      * this evidence lived only in the truncated verbose line).
      */
    def compact: String =
      f"""[$qps%.2f,${f.load}%.2f,${f.fcores}%.2f,${f.jitMs},${f.gcMs}]"""
  }

  /** Stage an isolated multi-split copy of sf lineitem: the three-round
    * q01 concurrency pin says the staged sf0.1 file is ONE parquet row
    * group, so per-query scan parallelism is 1 and concurrency can only
    * interleave whole queries. This restages the same rows as `parts`
    * files (= `parts` independent splits) in a temp dir; the
    * `q01_multirg` concurrent row then DEMONSTRATES whether the ceiling
    * moves with split count — turning the structural pin into evidence.
    */
  private def stageMultiSplit(spark: SparkSession, sfDir: String,
      parts: Int): String = {
    val dst = java.nio.file.Files.createTempDirectory("graft-multirg").toString
    spark.read.parquet(s"$sfDir/lineitem.parquet").repartition(parts)
      .write.parquet(s"$dst/lineitem.parquet")
    info(s"staged $parts-split lineitem at $dst")
    dst
  }

  private def rmTreeQuiet(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(); ()
    }
    try rm(new java.io.File(dir)) catch { case _: Throwable => () }
  }

  private def runConcurrent(spark: SparkSession, sfDir: String,
      cpus: Int): Seq[(String, Seq[BatchStats])] = {
    val concNames = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_QUERIES",
      "q01_pricing_summary,q06_revenue_forecast,a01_ann_bruteforce")
      .split(",").map(_.trim).filter(SparkEntry.queries.contains).toSeq
    val concIters = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_ITERS", "8").toInt
    val concBatches = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_BATCHES", "4").toInt
    val warmups = sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_WARMUPS", "3").toInt
    val workers = math.min(concIters, cpus)
    // the row-group-ceiling demonstration rides along whenever q01 is in
    // the set: same query, same rows, an 8-split staging of lineitem
    val multiRgParts = sys.env.getOrElse("SPARK_GRAFT_MULTIRG_PARTS", "8").toInt
    val multiRg: Option[(String, String, String)] =
      if (multiRgParts > 0 && concNames.contains("q01_pricing_summary"))
        try Some(("q01_multirg", "q01_pricing_summary",
          stageMultiSplit(spark, sfDir, multiRgParts)))
        catch { case e: Throwable =>
          info(s"multirg staging failed: ${e.getMessage}"); None
        }
      else None
    val entries = concNames.map(n => (n, n, sfDir)) ++ multiRg
    val out = entries.map { case (label, name, dir) =>
      val fn0 = SparkEntry.queries(name)
      val fn = (s: SparkSession, _: String) => fn0(s, dir)
      val nameForLog = label
      // serial warm-ups first: the isolated fresh JVM starts cold, and a
      // cold first batch is 32 threads of interpreted generated code
      // fighting the C2 queue — it measures the JIT, not the engine
      // (measured: cold concurrent q01 1.7 q/s vs ~7 warm). The serial
      // runs compile the plan's codegen classes once, quietly.
      (1 to warmups).foreach { _ =>
        spark.catalog.clearCache()
        try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () }
      }
      // ...then unmeasured CONCURRENT warm-up batches: r12 forensics showed
      // serial warm-ups alone leave the first measured batches on the JIT
      // ramp (q01 batches 5.6→5.0→6.9→7.0 q/s with jit_ms 8900→4669 —
      // eight parallel materializations exercise compilation the serial
      // pass never reaches), so best-of-N was sampling warm-up, not
      // steady state
      val warmupBatches = sys.env
        .getOrElse("SPARK_GRAFT_CONCURRENT_WARMUP_BATCHES", "2").toInt
      (1 to warmupBatches).foreach { _ =>
        spark.catalog.clearCache()
        val pool = Executors.newFixedThreadPool(workers)
        implicit val ec: EC = EC.fromExecutor(pool)
        try Await.result(
          Future.sequence((1 to concIters).map(_ => Future {
            fn(spark, sfDir).write.mode("overwrite").format("noop").save()
          })), Duration.Inf)
        catch { case _: Throwable => () } finally pool.shutdown()
      }
      // best-of-N batches, mirroring the serial min-of-N. A per-query time
      // budget bounds the pathological case: at least one batch always
      // runs, further batches only while under budget.
      val budgetNanos = sys.env
        .getOrElse("SPARK_GRAFT_CONCURRENT_BUDGET_SECS", "120").toLong * 1000000000L
      val tq0 = System.nanoTime()
      val batches = scala.collection.mutable.ArrayBuffer.empty[BatchStats]
      var b = 1
      // imperative loop: the budget must be checked AFTER each batch runs,
      // not eagerly over the whole range
      while (b <= concBatches &&
          (b == 1 || System.nanoTime() - tq0 < budgetNanos)) {
        info(s"concurrent $nameForLog batch $b")
        spark.catalog.clearCache()
        val pool = Executors.newFixedThreadPool(workers)
        implicit val ec: EC = EC.fromExecutor(pool)
        val (secs, forensics, ok) = try {
          measure {
            Await.result(
              Future.sequence((1 to concIters).map(_ => Future {
                fn(spark, sfDir).write.mode("overwrite").format("noop").save()
              })), Duration.Inf)
            true
          }
        } catch { case e: Throwable =>
          info(s"concurrent $nameForLog failed: ${e.getMessage}")
          (1.0, RunForensics(loadAvg(), 0.0, 0L, 0L, -1.0), false)
        } finally pool.shutdown()
        spark.catalog.clearCache()
        System.gc()
        batches += BatchStats(if (ok) concIters / secs else -1.0, forensics)
        b += 1
      }
      label -> batches.toSeq
    }
    multiRg.foreach { case (_, _, dir) => rmTreeQuiet(dir) }
    out
  }

  /** Ambient-CPU threshold above which a measured number is stamped
    * dirty: a foreign process averaging more than this many cores during
    * the run that produced the reported min/max. 1.0 clears kernel noise
    * and the monitoring tail while catching any real competitor.
    */
  private def dirtyForeignCores: Double =
    sys.env.getOrElse("SPARK_GRAFT_DIRTY_FCORES", "1.0").toDouble

  /** A reported min is JIT-CONTAMINATED when its own run spent both an
    * absolute chunk (default 0.75 s) AND more than a third of its wall
    * time inside the JIT compiler: r17's c03 carried 2.0 s of C2
    * compilation inside a 2.8 s "min" on a clean floor — a +18% phantom
    * regression the fcores gate cannot see — and r18's d06/d07/x16b
    * carried 1.1–1.2 s at 44–57% of wall, under the old 1.5 s/half bar,
    * so their +15–20% deltas shipped unattributed. The relative arm
    * matters: every run recompiles its fresh whole-stage-codegen classes
    * (a few hundred ms at sf0.1 — steady-state cost, not contamination),
    * so an absolute bar alone would flag most of the board.
    */
  private def jitThresholdMs: Long =
    sys.env.getOrElse("SPARK_GRAFT_JIT_MS", "750").toLong

  private def jitContaminated(fr: RunForensics, wallSecs: Double): Boolean =
    fr.jitMs > jitThresholdMs && fr.jitMs.toDouble > wallSecs * 1000.0 / 3.0

  private def concJson(rows: Seq[(String, Seq[BatchStats])], concIters: Int,
      workers: Int): String = {
    val cs = rows.map { case (k, bs) =>
      "\"" + k + f"\":${bs.map(_.qps).foldLeft(Double.MinValue)(math.max)}%.3f"
    }.mkString("{", ",", "}")
    val batches = rows.map { case (k, bs) =>
      "\"" + k + "\":" + bs.map(_.json).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // compact per-batch evidence, [qps,load,fcores,jit_ms,gc_ms] per
    // batch, keyed by the entry's short name — small enough to ride in
    // the tail-proof summary line
    val compact = rows.map { case (k, bs) =>
      "\"" + shortKey(k) + "\":" + bs.map(_.compact).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // BEST-batch-only fallback: the batch that produced each REPORTED
    // qps, one compact tuple per entry (~30 bytes each). r19's summary
    // dropped the whole per-batch map to "in_log" when the line
    // overflowed, and the q01_multirg halving shipped with zero
    // surviving evidence — the best batch alone explains a concurrent
    // delta (was the winning batch jit-ramped? under foreign load?) at
    // a tenth of the size.
    val best = rows.map { case (k, bs) =>
      "\"" + shortKey(k) + "\":" +
        (if (bs.isEmpty) "[]" else bs.maxBy(_.qps).compact)
    }.mkString("{", ",", "}")
    // the reported number per entry is the BEST batch's qps — the entry
    // is dirty when THAT batch ran against foreign CPU
    val dirtyEntries = rows.filter { case (_, bs) =>
      bs.nonEmpty && bs.maxBy(_.qps).f.fcores > dirtyForeignCores
    }.map(_._1)
    val concDirty = dirtyEntries.nonEmpty
    // short keys: these ride in the parent's bound-checked summary line
    val dirtyJson =
      dirtyEntries.map(n => "\"" + shortKey(n) + "\"").mkString("[", ",", "]")
    s""""concurrent_qps":$cs,"concurrent_batches":$batches,"concurrent_compact":$compact,"concurrent_best":$best,"concurrent_dirty":$concDirty,"concurrent_dirty_entries":$dirtyJson,"concurrent_iters":$concIters,"concurrent_workers":$workers"""
  }

  /** Short display key: leading `_`-segment, plus a disambiguating tail
    * for staged variants (`q01_multirg` → `q01m`, not `q01`).
    */
  private def shortKey(n: String): String = {
    val head = n.split("_").head
    if (n.endsWith("_multirg")) head + "m" else head
  }

  /** Extract `"key":<value>` from a flat JSON fragment, where value is a
    * balanced object/array or a scalar — enough structure awareness to
    * lift the child's compact fields into the parent's summary line
    * without a JSON library.
    */
  private def fragField(frag: String, key: String): Option[String] = {
    val tag = "\"" + key + "\":"
    val i = frag.indexOf(tag)
    if (i < 0) return None
    val start = i + tag.length
    frag(start) match {
      case c @ ('{' | '[') =>
        val close = if (c == '{') '}' else ']'
        var depth = 0
        var j = start
        while (j < frag.length) {
          if (frag(j) == c) depth += 1
          else if (frag(j) == close) { depth -= 1; if (depth == 0) return Some(frag.substring(start, j + 1)) }
          j += 1
        }
        None
      case _ =>
        val j = frag.indexWhere(ch => ch == ',' || ch == '}', start)
        Some(frag.substring(start, if (j < 0) frag.length else j))
    }
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
      // stream the child's stdout: forward its progress lines live (they
      // are [bench-info]-prefixed), keep only the JSON fragment line
      var fragLine: Option[String] = None
      val src = scala.io.Source.fromInputStream(p.getInputStream)
      for (line <- src.getLines()) {
        if (line.startsWith("{\"concurrent_qps\"")) fragLine = Some(line)
        else info(s"[child] $line")
      }
      val code = p.waitFor()
      val frag = fragLine.map(_.stripPrefix("{").stripSuffix("}"))
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
      // reproducible. The serial residue is exactly the decaying-residue
      // case the gate's decay rule accepts early; a genuinely idle floor
      // (≤0.7) is better still for the ≥5 q/s q01 bar, so the child waits
      // for idle first and takes the decay exit only late (the wait is
      // bounded; loadavg decays with a ~60 s time constant).
      val maxLoad = sys.env.getOrElse("SPARK_GRAFT_MAX_LOAD", "0.7").toDouble
      val (settleDirty, settleTraj) = settleGate(maxLoad, hardCap = 1.5,
        sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_LOAD_WAIT_SECS", "300").toLong,
        "concurrent section")
      if (settleDirty)
        info(f"concurrent section starting on residual load ${loadAvg()}%.2f")
      val spark = buildSession(cpus)
      Thread.sleep(
        sys.env.getOrElse("SPARK_GRAFT_CONCURRENT_SETTLE_MS", "4000").toLong)
      val rows = runConcurrent(spark, sfDir, cpus.toInt)
      println("{" + concJson(rows, concIters, workers) +
        f""","concurrent_load_at_start":${settleTraj.last}%.2f,"concurrent_settle_trajectory":${trajJson(settleTraj)}}""")
      spark.stop()
      return
    }

    // Ambient-load gate (reference treats cross-run consistency as
    // first-class, `local_benchmarks.rs:169-185`): a benchmark started on a
    // busy machine measures the machine, not the engine — round 6's numbers
    // were contaminated by a pre-run load of 4.95 on this 32-core box.
    // The r9 A/B showed the old single ≤2.0 snapshot anti-correlates with
    // outcome (decaying residue ≠ live competitor); settleGate waits for a
    // genuinely idle floor (≤0.7 default) and accepts decaying residue
    // early. If neither happens by SPARK_GRAFT_LOAD_WAIT_SECS, run anyway
    // but stamp `"dirty":true` so the artifact self-reports as
    // non-comparable; the gate's sampled trajectory lands in the JSON.
    val maxLoad = sys.env.getOrElse("SPARK_GRAFT_MAX_LOAD", "0.7").toDouble
    val loadWaitSecs = sys.env.getOrElse("SPARK_GRAFT_LOAD_WAIT_SECS", "600").toLong
    val (dirty, gateTraj) = settleGate(maxLoad, hardCap = 2.0, loadWaitSecs,
      "serial section")
    if (dirty) info(
      f"WARNING: starting on a loaded machine (${loadAvg()}%.2f > $maxLoad%.1f, not decaying, after ${loadWaitSecs}s) — results stamped dirty:true")

    val spark = buildSession(cpus)
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt

    def materialize(name: String): (Double, RunForensics) = {
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      try {
        val (secs, f, _) = measure {
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        }
        (secs, f)
      } catch { case e: Throwable =>
        info(s"$name failed: ${e.getMessage}")
        (-1.0, RunForensics(loadAvg(), 0.0, 0L, 0L, -1.0))
      }
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
      val runs0 = (1 to iters).map(_ => materialize(n))
      // JIT-contaminated minimum (the r17 c03 class: the C2 ramp on the
      // largest composed pipelines can land INSIDE every timed
      // iteration): when the best run still spent > jitThresholdMs
      // compiling, ONE salvage iteration runs with the compiler warm
      // and joins the candidate set; if the min stays jit-heavy the
      // summary attributes it (jit_queries) instead of shipping an
      // unexplainable regression.
      val runs = {
        val m = runs0.minBy(_._1)
        if (runs0.exists(_._1 == -1.0) || !jitContaminated(m._2, m._1))
          runs0
        else {
          // a FAILED salvage run must not poison a query whose primary
          // iterations all succeeded — it only ever improves the min
          val salvage = materialize(n)
          if (salvage._1 == -1.0) runs0 else runs0 :+ salvage
        }
      }
      // reclaim this query's broadcasts/shuffles before the next entry
      spark.catalog.clearCache()
      System.gc()
      val failed = runs.exists(_._1 == -1.0)
      // forensics of the run that produced the reported min: under what
      // ambient load, and at what jit/gc cost, that number was measured
      val minRun = runs.minBy(_._1)
      (n, if (failed) -1.0 else minRun._1,
        if (failed) -1.0 else median(runs.map(_._1)), minRun._2,
        runs.map(_._1))
    }
    val qs = results.map { case (k, v, _, _, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val qsMed = results.map { case (k, _, m, _, _) => "\"" + k + f"\":$m%.3f" }
      .mkString("{", ",", "}")
    val qsForensics = results
      .map { case (k, _, _, f, _) => "\"" + k + "\":" + f.json }
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
    // per-query dirty: the run that PRODUCED each reported min saw this
    // much foreign CPU — a start-gate-only dirty misses competitors that
    // arrive mid-run (r16: serial hot rows recorded load 2.3–3.6 under
    // dirty:false, unattributable between self-load and ambient)
    val dirtyQueries = results.collect {
      case (k, _, _, fr, _) if fr.fcores > dirtyForeignCores => k
    }
    // queries whose reported min is STILL jit-heavy after the salvage
    // iteration — their wall number includes compiler time and must not
    // be read as an engine regression
    val jitQueries = results.collect {
      case (k, v, _, fr, _) if v > 0 && jitContaminated(fr, v) => k
    }
    val jitQueriesJson =
      jitQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val serialDirty = dirty || dirtyQueries.nonEmpty
    val dirtyQueriesJson =
      dirtyQueries.map("\"" + _ + "\"").mkString("[", ",", "]")
    val dirtyQueriesShortJson =
      dirtyQueries.map(n => "\"" + shortKey(n) + "\"").mkString("[", ",", "]")
    val concDirty = fragField(concFragment, "concurrent_dirty")
      .contains("true")
    val anyDirty = serialDirty || concDirty
    val env = f""""load_avg_before":$loadBefore%.2f,"load_avg_after":$loadAfter%.2f,"load_gate_trajectory":${trajJson(gateTraj)},"foreign_jvms_before":$jvmsBefore,"foreign_jvms_after":$jvmsAfter,"iters":$iters,"dirty":$anyDirty,"dirty_gate":$dirty,"dirty_queries":$dirtyQueriesJson,"jit_queries":$jitQueriesJson"""

    // The VERBOSE record (every per-query median/forensic field, the full
    // concurrent fragment) goes to the log file: r16 proved the driver's
    // stdout capture is bounded and overflow silently truncates the END
    // of output — printing this ~7 KB line to stdout is what pushed the
    // r16 run past the bound and cut the summary line out of the graded
    // artifact.
    info(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"queries_median":$qsMed,"queries_forensics":$qsForensics,$env,$concFragment,"concurrent_isolated":$isolated,"sf":"$sfDir"}""")
    // SERIAL forensics tail line: per-run serial evidence (every run's
    // wall seconds, plus the min-run's load/fcores/jit/gc for the slowest
    // entries) in one compact line right before the summary. Short keys
    // (each headline name's leading segment is unique) and 2-decimal
    // arrays keep it small; a serial regression is then attributable
    // (ambient load vs jit storm vs real) from the artifact alone.
    // Deliberately does NOT start with `{"metric"` — the summary line
    // must stay the unique match for the driver's JSON extractor.
    val runsJson = results.map { case (k, _, _, _, rs) =>
      "\"" + shortKey(k) + "\":" +
        rs.map(r => f"$r%.2f").mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val hotJson = results.sortBy(-_._2).take(6)
      .map { case (k, _, _, fr, _) =>
        "\"" + shortKey(k) +
          f"""\":{"l":${fr.load}%.2f,"f":${fr.fcores}%.2f,"j":${fr.jitMs},"g":${fr.gcMs}}"""
      }.mkString("{", ",", "}")
    println(s"""{"runs":$runsJson,"hot":$hotJson,"iters":$iters,"dirty":$serialDirty}""")
    // Tail-proof summary: the forensic line above grew past the driver's
    // fixed-size tail capture in r10, truncating the headline per-query
    // wall times out of the artifact. A compact line with ONLY the
    // headline numbers — now INCLUDING the per-batch concurrent evidence
    // (compact form) and the per-query dirty attribution, the two fields
    // whose truncation made r16's q01_multirg contradiction undiagnosable
    // — prints LAST so the final ~2 KB of output always carries them.
    val concQps = fragField(concFragment, "concurrent_qps").getOrElse("{}")
    val concCompact =
      fragField(concFragment, "concurrent_compact").getOrElse("{}")
    val concBest =
      fragField(concFragment, "concurrent_best").getOrElse("{}")
    val concDirtyEntries =
      fragField(concFragment, "concurrent_dirty_entries").getOrElse("[]")
    // per-query jit-ms IN the summary line (flagged queries + the top-5
    // JIT spenders): r18's `hot` tail line was truncated out of the
    // graded artifact by the driver's capture bound, leaving a +11%
    // serial delta with no surviving evidence — the summary line is the
    // only tail-proof spot, and ~100 bytes of jit-ms is what a
    // round-over-round regression needs to self-explain.
    def jitEvidence(topN: Int): String = {
      val top = results.filter(_._2 > 0).sortBy(-_._4.jitMs).take(topN)
        .map(_._1) ++ jitQueries.take(topN)
      results.filter(r => top.contains(r._1))
        .map { case (k, _, _, fr, _) => "\"" + shortKey(k) + "\":" + fr.jitMs }
        .mkString("{", ",", "}")
    }
    // jit_queries rides SHORT-KEYED in the summary line (full names in
    // the log's total line): a JIT-heavy round can flag 15+ queries and
    // the full-name array alone (~25 bytes each) crowded the concurrent
    // evidence out of the r20 rehearsal's line
    val jitQueriesShort =
      jitQueries.map(n => "\"" + shortKey(n) + "\"").mkString("[", ",", "]")
    def summaryLine(cb: String, jit: String,
        dq: String = dirtyQueriesShortJson,
        dc: String = concDirtyEntries): String =
      f"""{"metric":"summary","value":$total%.3f,"unit":"sec","queries":$qs,"concurrent_qps":$concQps,"cb":$cb,"dirty":$anyDirty,"dirty_queries":$dq,"jit_queries":$jitQueriesShort,"jit_ms":$jit,"dirty_conc":$dc,"sf":"$sfDir"}"""
    // hard bound: the line must fit the driver's ~2 KB tail WITH the
    // runs line's end and sbt's trailing [success] line; evidence sheds
    // in order of dispensability (the full per-batch map degrades to
    // the BEST-batch-per-entry map — which alone attributes any
    // concurrent delta — before anything drops to the log, then the jit
    // map shrinks, last resort drops it) — EVERY candidate is checked
    // against the bound, because a JIT-heavy round can grow
    // jit_queries/jit_ms enough that even the "in_log" fallback would
    // otherwise overflow and truncate the summary out of the artifact
    val candidates = Seq(
      summaryLine(concCompact, jitEvidence(5)),
      summaryLine(concBest, jitEvidence(5)),
      summaryLine(concBest, jitEvidence(3)),
      summaryLine(concBest, "\"in_log\""),
      summaryLine("\"in_log\"", "\"in_log\""),
      // absolute last resort: a pathological round could flag every
      // query dirty — the dirty LISTS shed too before the line is ever
      // allowed to overflow the tail capture (the dirty:true flag and
      // the full lists in the log still tell the story)
      summaryLine("\"in_log\"", "\"in_log\"", "\"in_log\"", "\"in_log\""))
    val summary = candidates.find(_.length <= 1900).getOrElse(candidates.last)
    // Mirror the summary to a stable file BEFORE printing: the driver's
    // stdout parse has failed three rounds running (parsed:null in
    // BENCH_r18/19/20 — sbt's forked-run logger prefixed the line with
    // "[info] "). The stdout print stays the primary contract (now bare via
    // run/outputStrategy := StdoutOutput); the file is the unmissable copy.
    try {
      val out = java.nio.file.Paths.get("target", "bench_summary.json")
      Option(out.getParent).foreach(p => { java.nio.file.Files.createDirectories(p); () })
      java.nio.file.Files.write(out,
        (summary + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      ()
    } catch { case e: Throwable => info(s"summary mirror failed: ${e.getMessage}") }
    println(summary)
    SparkSession.getActiveSession.foreach(_.stop())
  }
}
