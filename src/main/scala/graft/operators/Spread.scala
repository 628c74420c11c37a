package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Partitioning helpers for CPU-DENSE narrow stages (shingling, minhash
  * digests, hyperplane signatures, binary decode): work whose cost is
  * per-row compute, not bytes. AQE's partition coalescing is byte-driven
  * — a few-MB shuffle collapses to one or two post-shuffle partitions,
  * which is right for byte-bound operators but SERIALIZES a compute-bound
  * map onto one core (measured on the minhash signature stage: an
  * 850 ms single-task stage that is ~30 ms/task spread across the
  * machine). These helpers pin the partition count to the session's
  * `spark.sql.shuffle.partitions` — the conf a cluster deployment already
  * sizes to its parallelism (local default: the core count), so the value
  * is scale-adaptive by configuration, never a constant — and an explicit
  * count is exactly what AQE's coalescer leaves alone.
  */
object Spread {

  private def target(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Hash-repartition by `key` at the configured shuffle parallelism.
    * Same exchange the bare `repartition(key)` plans — the explicit
    * count only stops AQE from coalescing it below the machine's cores
    * when the bytes are small but the downstream map is compute-bound.
    */
  def byKey(df: DataFrame, key: Column): DataFrame =
    df.repartition(target(df), key)

  /** Round-robin spread for a compute-bound map over a source whose scan
    * parallelism is below the configured shuffle parallelism (locally: a
    * single small parquet file = one split). A source that already plans
    * enough partitions (any real table at scale) passes through with NO
    * added exchange — the spread only exists to stop a one-split scan
    * from serializing per-row compute onto one core.
    */
  def forCpu(df: DataFrame): DataFrame = {
    val n = target(df)
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }

  /** [[forCpu]] at HALF the configured parallelism, for CODEC-heavy seams
    * (ImageIO encode/decode): the codecs allocate large short-lived
    * buffers per blob, and at full machine width the tasks contend on the
    * allocator/GC instead of decoding (measured on m01: 32-way spends ~2×
    * the serial CPU for the wall win; see OPTIMIZATION_r20.md). Half
    * width keeps the wall win while halving the contention. Same
    * scale-adaptive story as [[forCpu]]: the width derives from the
    * session's shuffle-partition conf, and a source that already plans
    * that many splits passes through untouched.
    */
  def forCodec(df: DataFrame): DataFrame = {
    val n = math.max(2, target(df) / 2)
    if (df.rdd.getNumPartitions >= n) df else df.repartition(n)
  }
}
