package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Partitioning helpers for CPU-DENSE narrow stages (shingling, minhash
  * digests, hyperplane signatures, binary decode): work whose cost is
  * per-row compute, not bytes. AQE's partition coalescing is byte-driven
  * — a few-MB shuffle collapses to one or two post-shuffle partitions,
  * which is right for byte-bound operators but SERIALIZES a compute-bound
  * map onto one core (measured on the minhash signature stage: an
  * 850 ms single-task stage that is ~30 ms/task spread across the
  * machine).
  *
  * Width is SIZE-ADAPTIVE in both directions (the r20 lesson, both ways):
  * the ceiling is the session's `spark.sql.shuffle.partitions` (the conf a
  * cluster deployment already sizes to its parallelism — local default:
  * the core count — so the ceiling is scale-adaptive by configuration,
  * never a constant), and the width below that ceiling derives from the
  * input's ANALYZED-PLAN size statistics: one spread partition per
  * `bytesPerTask` of estimated input. Pinning every spread to the full
  * ceiling regardless of input size was r20's one real regression
  * (d02b/d06b, ~2x): on a capped/tiny relation a 32-way spread buys no
  * parallelism and pays ~6 downstream stages x 32 task launches of fixed
  * cost — the 8-core run of the same binary returned both queries to
  * their pre-spread times, proving the mechanism.
  *
  * The width decision reads `optimizedPlan.stats`, NEVER `df.rdd`:
  * converting a DataFrame with upstream shuffles to an RDD under AQE
  * materializes its query stages — i.e. runs jobs at query CONSTRUCTION
  * time, and that work is then recomputed by the real run (the r20
  * latent footgun; SpreadSpec pins job-free composition).
  */
object Spread {

  private def target(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Estimated input bytes from the optimized logical plan's statistics
    * (file sizes for scans, scaled by projection width; default-size
    * estimates for local relations). Plan-only: triggers analysis and
    * optimization of the subtree but never execution.
    */
  private def sizeEstimate(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** Default per-task input floor for text/vector compute (shingling,
    * minhash, hyperplane signatures, BPE, feature hashing): ~80 KB of
    * input per task keeps each task's compute comfortably above the
    * per-task launch/result fixed cost (measured ~2-3 ms each in local
    * mode; the r20 d02b regression was ~200 near-empty task launches).
    * At sf0.1 this spreads the 0.6-0.8 MB doc/embedding relations 8-10
    * wide — the width at which the r20 8-core run showed the compute
    * wins saturate — and at any real scale the estimate clamps to the
    * configured ceiling.
    */
  private val denseBytesPerTask: Long = 80L * 1024

  private def clampWidth(df: DataFrame, bytesPerTask: Long): Int = {
    val n = target(df)
    val bytes = sizeEstimate(df)
    val byData = (bytes + bytesPerTask - 1) / bytesPerTask
    if (byData >= n) n else math.max(1, byData.toInt)
  }

  /** Planned scan parallelism estimate, job-free: how many splits Spark's
    * file packing would give this input (`sizeInBytes / maxPartitionBytes`,
    * ignoring per-file open cost — an UNDERestimate for many tiny files,
    * which only ever errs toward adding a spread that AQE-scale inputs
    * don't need). Used for the pass-through decision: a source that
    * already plans at least the spread width gets NO added exchange.
    */
  private def plannedSplitsEstimate(df: DataFrame): Long = {
    val maxSplit = df.sparkSession.sessionState.conf.filesMaxPartitionBytes
    val bytes = sizeEstimate(df)
    ((bytes + maxSplit - 1) / math.max(1L, maxSplit)).toLong
  }

  /** Hash-repartition by `key` at the size-derived width (capped at the
    * configured shuffle parallelism). Same exchange the bare
    * `repartition(key)` plans — the explicit count only stops AQE from
    * coalescing it below the data-justified width when the bytes are
    * small but the downstream map is compute-bound.
    */
  def byKey(df: DataFrame, key: Column,
      bytesPerTask: Long = denseBytesPerTask): DataFrame =
    df.repartition(clampWidth(df, bytesPerTask), key)

  /** Round-robin spread for a compute-bound map over a source whose scan
    * parallelism is below the size-derived width (locally: a single small
    * parquet file = one split). A source that already plans enough
    * partitions (any real table at scale) passes through with NO added
    * exchange — the spread only exists to stop a one-split scan from
    * serializing per-row compute onto one core.
    *
    * `bytesPerTask` is the call site's work-density declaration: how many
    * bytes of INPUT amortize one task's fixed cost. Sites whose rows fan
    * out into much larger payloads (8-byte doc ids that become KB-scale
    * synthetic blobs) pass a small value; plain text/vector compute uses
    * the default.
    */
  def forCpu(df: DataFrame,
      bytesPerTask: Long = denseBytesPerTask): DataFrame = {
    val w = clampWidth(df, bytesPerTask)
    if (plannedSplitsEstimate(df) >= w || w <= 1) df else df.repartition(w)
  }

  /** [[forCpu]] at HALF the configured ceiling, for CODEC-heavy seams
    * (ImageIO encode/decode): the codecs allocate large short-lived
    * buffers per blob, and at full machine width the tasks contend on the
    * allocator/GC instead of decoding (measured on m01: 32-way spends ~2×
    * the serial CPU for the wall win; see OPTIMIZATION_r20.md). Half
    * width keeps the wall win while halving the contention. Same
    * size-adaptive story as [[forCpu]]: the data-derived width applies
    * under the halved ceiling, and a source that already plans that many
    * splits passes through untouched.
    */
  def forCodec(df: DataFrame,
      bytesPerTask: Long = denseBytesPerTask): DataFrame = {
    val half = math.max(2, target(df) / 2)
    val w = math.min(half, math.max(2, clampWidth(df, bytesPerTask)))
    if (plannedSplitsEstimate(df) >= w) df else df.repartition(w)
  }
}
