package graft

import org.apache.spark.sql.SparkSession

import graft.queries.Registry

/** Dev utility for bench self-consistency (round-7 directive 1): run the
  * FULL headline list in ONE session with the exact Bench methodology
  * (warm-up, min-of-N, clearCache + gc between entries), recording per-run
  * procCpu / JIT / top-stage accounting for every query — and when the
  * list reaches d03, A/B the minhash materialization strategies INLINE
  * (checkpoint vs cache vs none via the `graft.minhash.materialize`
  * sysprop) in the same list context the headline number is produced in.
  * This settles whether a d03 headline ≠ narrow-list A/B divergence is
  * list-context cost (GC/code-cache debt of the preceding queries) or a
  * strategy difference.
  *
  * Output: one human-readable line per run on stderr, plus a final
  * per-query min summary. Not part of the driver contract; `graft.Bench`
  * stays the artifact producer.
  */
object Reconcile {
  private case class RunStats(secs: Double, procCpu: Double, jitMs: Long,
      gcMs: Long)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // focus queries get per-stage breakdowns on their slowest run
    val focus = sys.env.getOrElse("GRAFT_RECONCILE_FOCUS",
      "d03_minhash_lsh,q03_shipping_priority,q13_customer_distribution,q21_waiting_suppliers")
      .split(",").map(_.trim).toSet

    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.put(si.stageId, (si.name.takeWhile(_ != '\n').take(60), wall,
          si.taskMetrics.executorRunTime, si.taskMetrics.jvmGCTime))
      }
    })

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val gcBeans = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
    def gcTotalMs(): Long = {
      var t = 0L
      gcBeans.forEach(b => t += math.max(b.getCollectionTime, 0L))
      t
    }

    def one(name: String, tag: String, showStages: Boolean): RunStats = {
      val fn = SparkEntry.queries(name)
      spark.catalog.clearCache()
      stages.clear()
      val cpu0 = osBean.getProcessCpuTime
      val jit0 = java.lang.management.ManagementFactory.getCompilationMXBean
        .getTotalCompilationTime
      val gc0 = gcTotalMs()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val st = RunStats(secs,
        (osBean.getProcessCpuTime - cpu0) / 1e9,
        java.lang.management.ManagementFactory.getCompilationMXBean
          .getTotalCompilationTime - jit0,
        gcTotalMs() - gc0)
      System.err.println(
        f"[reconcile] $name%-28s $tag%-12s ${st.secs}%7.3f s  procCpu=${st.procCpu}%6.1f s  jit=${st.jitMs}%6d ms  gc=${st.gcMs}%5d ms")
      if (showStages) {
        import scala.jdk.CollectionConverters._
        stages.asScala.toSeq.sortBy(-_._2._2).take(6).foreach {
          case (id, (nm, wall, run, gc)) =>
            System.err.println(
              f"[reconcile]     stage $id%5d wall=${wall}%6d ms taskRun=${run}%7d ms gc=${gc}%5d ms  $nm")
        }
      }
      st
    }

    def series(name: String, tag: String): Seq[RunStats] = {
      val runs = (1 to iters).map(i =>
        one(name, s"$tag#$i", showStages = focus.contains(name)))
      spark.catalog.clearCache()
      System.gc()
      runs
    }

    val headline = Registry.all.filter(_.headline).map(_.name)
    System.err.println(s"[reconcile] headline list (${headline.size}): ${headline.mkString(", ")}")
    // Bench-identical warm-up
    one(headline.head, "warmup", showStages = false)

    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    headline.foreach { name =>
      val runs = series(name, "run")
      mins(name) = runs.map(_.secs).min
      if (name == "d03_minhash_lsh") {
        // the INLINE A/B: same session, same list position, only the
        // materialization strategy changes
        for (mat <- Seq("checkpoint", "cache", "none")) {
          sys.props("graft.minhash.materialize") = mat
          try {
            val ab = series(name, s"mat=$mat")
            mins(s"$name[mat=$mat]") = ab.map(_.secs).min
          } finally sys.props.remove("graft.minhash.materialize")
        }
      }
    }

    System.err.println("[reconcile] ===== per-query minimums =====")
    mins.foreach { case (k, v) =>
      System.err.println(f"[reconcile] min $k%-40s $v%7.3f s")
    }
    spark.stop()
  }
}
