package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned time-range join: the equi-join rewrite of a pure range
  * predicate. A join whose ONLY condition is `build.ts in
  * [probe.ts - W, probe.ts)` has no equi key, so Catalyst can only plan
  * it as a broadcast-nested-loop / cartesian — O(N·M) row comparisons
  * that are fatal at any real scale (the reference inherits the same
  * limitation: DataFusion plans a NestedLoopJoin for pure inequality
  * conditions). The standard fix is to QUANTIZE the time axis into
  * W-wide bins: a build row in bin b can only match probe rows in bins
  * {b, b+1}, so exploding each probe into its two candidate bins turns
  * the range join into an equi-join on the bin id plus a residual range
  * filter — one shuffle, hash-joinable, and the candidate pairs per probe
  * are bounded by the rows in a 2W window instead of the whole table.
  *
  * Scale posture: the shuffle key is the bin id, so partitions are time
  * slices — at 100 TB the join parallelizes over the time axis, and a
  * hot minute (bin skew) is exactly what AQE's skew-join splitting
  * handles because the residual filter is stateless. Bin width = window
  * width keeps the candidate factor at exactly 2 explode copies per
  * probe; a narrower window never needs more bins.
  */
object RangeJoin {

  /** True FLOOR division of a long SQL expression by positive literal
    * `b`: `div` truncates toward zero, which disagrees with floor for
    * negative (pre-epoch) micros — the binned forms need real floor
    * bins or a window spanning epoch zero misclassifies its edge bins.
    */
  private def floorDiv(e: String, b: Long): String =
    s"(($e) div ${b}L + (CASE WHEN (($e) % ${b}L) < 0 THEN -1 ELSE 0 END))"

  /** Micros-since-epoch of a timestamp column, tolerant of the physical
    * encodings external tables ship as: TIMESTAMP passes through,
    * TIMESTAMP_NTZ is cast under the (UTC) session zone — the same
    * normalization posture as Tables.normalizeEventTs, so the operator
    * works on raw footer-inferred frames, not only pre-normalized ones.
    */
  private def usOf(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** For each probe row, the COUNT of build rows whose `buildTs` falls in
    * `[probeTs - windowSec, probeTs)` — strictly before the probe, so a
    * row never counts itself when probe and build are the same relation.
    * Probes with an empty window are kept with `n_prior` 0 (left
    * semantics). `keyCols` MUST identify a probe row uniquely (the
    * grouping that collapses the two bin copies back into one output
    * row): two probe rows sharing a key would silently merge into one
    * wrong combined count, so the contract is ENFORCED — each probe row
    * carries a plan-local row id, and a group whose ids disagree raises
    * at execution time instead of emitting a merged number. The check
    * rides the existing aggregate (a min/max over an id the explode
    * copies share) — no extra job, shuffle, or scan.
    */
  def countPrior(probe: DataFrame, build: DataFrame, probeTs: String,
      buildTs: String, windowSec: Long, keyCols: Seq[String]): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val w = windowSec * 1000000L // micros
    val p = probe
      .withColumn("__pid", monotonically_increasing_id())
      .withColumn("__p_us", usOf(col(probeTs)))
      // integer div, not floor(double /): at epoch-micros magnitudes a
      // double quotient sits within a few ulp of bin boundaries
      .withColumn("__bin", expr(floorDiv("__p_us", w)))
      // explode into the two candidate bins: a build row strictly inside
      // the W-wide window behind the probe lives in the probe's own bin
      // or the one before it, never further
      .withColumn("__jbin", explode(array(col("__bin") - 1, col("__bin"))))
    val b = build.select(usOf(col(buildTs)).as("__b_us"))
      .withColumn("__bbin", expr(floorDiv("__b_us", w)))
    val joined = p.join(b,
      col("__jbin") === col("__bbin") &&
        col("__b_us") >= col("__p_us") - lit(w) &&
        col("__b_us") < col("__p_us"),
      "left_outer")
    // each matching build row satisfies the residual range in exactly ONE
    // of the two bin copies (its own bin), so the regrouped count is exact
    joined.groupBy(keyCols.map(col): _*)
      .agg(count(col("__b_us")).as("__np"),
        min(col("__pid")).as("__pid_lo"), max(col("__pid")).as("__pid_hi"))
      .select(keyCols.map(col) :+
        when(col("__pid_lo") =!= col("__pid_hi"), raise_error(lit(
          "RangeJoin.countPrior: keyCols do not identify probe rows " +
            "uniquely — distinct probe rows share a key and their counts " +
            "would merge")))
          .otherwise(col("__np")).as("n_prior"): _*)
  }

  /** HIERARCHICAL form of [[countPrior]] for COUNT-type range joins over
    * dense streams: pre-aggregate the build side into fine bins of width
    * `windowSec / m`, answer each probe's window as (sum of the fully-
    * contained bins' pre-counts) + (raw rows joined ONLY in the two edge
    * bins, range-filtered). [[countPrior]] materializes O(density × W)
    * candidate pairs per probe; here the full-bin part touches the tiny
    * per-bin aggregate (corpus-independent rows per probe: ≤ m+1) and
    * raw pairs shrink to the two edge bins — a ~m/2× cut in join work,
    * the lever that matters when the window holds thousands of events.
    * Exact, not approximate: the bin split is a partition of the window.
    * `windowSec` must be divisible by `m`.
    */
  def countPriorBinned(probe: DataFrame, build: DataFrame, probeTs: String,
      buildTs: String, windowSec: Long, m: Int,
      keyCols: Seq[String]): DataFrame = {
    require(windowSec > 0 && m > 1 && windowSec % m == 0,
      s"windowSec ($windowSec) must be positive and divisible by m ($m)")
    val w = windowSec * 1000000L
    val b = w / m // fine-bin width, micros
    val keyC = keyCols.map(col)
    // same keyCols-uniqueness contract and enforcement as countPrior: the
    // edge aggregate sees EVERY probe row (see below), so its min/max row
    // id detects any merged pair exactly.
    val p = probe
      .withColumn("__pid", monotonically_increasing_id())
      .withColumn("__p_us", usOf(col(probeTs)))
      .withColumn("__lo", col("__p_us") - lit(w))
      // candidate fine bins floor(lo/b) .. floor(p/b): m+1 ids
      .withColumn("__k", explode(expr(
        s"sequence(${floorDiv(s"__p_us - ${w}L", b)}, ${floorDiv("__p_us", b)})")))
      .withColumn("__isFull",
        col("__k") * b >= col("__lo") && (col("__k") + 1) * b <= col("__p_us"))
    val binned = build.select(usOf(col(buildTs)).as("__b_us"))
      .withColumn("__bk", expr(floorDiv("__b_us", b)))
    val binCounts = binned.groupBy(col("__bk"))
      .agg(count(lit(1)).as("__bn"))
    val fullPart = p.filter(col("__isFull"))
      .join(binCounts, col("__k") === col("__bk"))
      .groupBy(keyC: _*).agg(sum(col("__bn")).as("__full_n"))
    // the LAST candidate bin (id floor(p/b)) starts at or after the
    // probe's own instant, so it can never be fully inside the half-open
    // window — EVERY probe row owns at least one edge bin. A left-outer
    // join therefore keeps zero-match probes alive here (no third join
    // back to `probe` needed for left semantics) and makes this aggregate
    // the exact uniqueness guard: a duplicated key always lands both row
    // ids in one group.
    val edgePart = p.filter(!col("__isFull"))
      .join(binned, col("__k") === col("__bk") &&
        col("__b_us") >= col("__lo") && col("__b_us") < col("__p_us"),
        "left_outer")
      .groupBy(keyC: _*).agg(count(col("__b_us")).as("__edge_n"),
        min(col("__pid")).as("__pid_lo"), max(col("__pid")).as("__pid_hi"))
    edgePart
      .join(fullPart, keyCols, "left_outer")
      .select(keyC :+
        when(col("__pid_lo") =!= col("__pid_hi"), raise_error(lit(
          "RangeJoin.countPriorBinned: keyCols do not identify probe " +
            "rows uniquely — distinct probe rows share a key and their " +
            "counts would merge")))
          .otherwise(coalesce(col("__full_n"), lit(0L)) + col("__edge_n"))
          .as("n_prior"): _*)
  }

  /** General form: all (probe, build) pairs with `buildTs` in
    * `[probeTs - windowSec, probeTs)`, via the same bin equi-join. The
    * build side must be pre-renamed by the caller to avoid ambiguous
    * columns; returns probe.* ++ build.* for each matching pair.
    */
  def joinPrior(probe: DataFrame, build: DataFrame, probeTs: String,
      buildTs: String, windowSec: Long,
      extraCondition: Option[Column] = None): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val w = windowSec * 1000000L
    val p = probe
      .withColumn("__p_us", usOf(col(probeTs)))
      .withColumn("__jbin",
        explode(expr(s"array(${floorDiv("__p_us", w)} - 1, ${floorDiv("__p_us", w)})")))
    val b = build
      .withColumn("__b_us", usOf(col(buildTs)))
      .withColumn("__bbin", expr(floorDiv("__b_us", w)))
    val cond = col("__jbin") === col("__bbin") &&
      col("__b_us") >= col("__p_us") - lit(w) &&
      col("__b_us") < col("__p_us")
    p.join(b, extraCondition.fold(cond)(cond && _))
      .drop("__p_us", "__jbin", "__b_us", "__bbin")
  }
}
