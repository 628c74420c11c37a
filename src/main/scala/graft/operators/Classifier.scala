package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document classifier — the fastText-style linear model quality
  * pipelines actually train (GPT-3 / Brown et al. 2020 appendix A trained
  * a logistic classifier with curated text as positives vs raw crawl as
  * negatives, then kept crawl documents the model scored high; CCNet and
  * most successor pipelines do the same). The reference engine has no
  * learned operators at all — this extends the training-data family with
  * the TRAIN side, not just apply.
  *
  * Model: logistic regression over hashed bag-of-words features (`dims`
  * buckets, binary presence), trained by full-batch gradient descent.
  * All state is micro-unit INTEGERS (1e-6 fixed point): weights, labels,
  * probabilities, and gradients are longs, so every sum is exact and
  * order-independent, and the one transcendental per step (exp inside the
  * sigmoid) is immediately re-quantized to an integer — a DuckDB oracle
  * replays the entire training loop bit for bit (the t13/a12 pattern).
  *
  * Shape at 100 TB: feature buckets are built IN-ROW (`featureBuckets`
  * composes codegen'd natives — split/md5/conv inside a transform — so
  * word strings never leave their row); each GD iteration is ONE narrow
  * corpus pass (per-doc margin via an in-row dot product against the
  * weight array literal — no join, no doc-keyed shuffle) feeding ONE
  * groupBy over `dims`+1 keys with map-side combine; driver/broadcast
  * state is `dims` longs. Scoring is a pure narrow map. Nothing about the
  * loop grows with corpus size except the scans.
  */
object Classifier {

  private val Micro = 1000000L

  /** Distinct hashed word buckets of a text, computed in-row: the 16-bit
    * md5 bucket ([[Sampling.bucket16]]'s construction, portable to DuckDB)
    * folded into `dims`.
    */
  def featureBuckets(text: Column, dims: Int): Column =
    array_distinct(transform(
      filter(split(trim(text), "\\s+"), w => w =!= ""),
      w => conv(substring(md5(w), 1, 4), 16, 10).cast("long") % dims))

  /** ROUND half-away-from-zero, matching Spark SQL `round` and DuckDB
    * `ROUND` on the driver side.
    */
  private def roundHalfAway(x: Double): Long =
    (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong

  /** Train by `iters` full-batch GD steps at learning rate `lr`; returns
    * (bucket weights, bias) in micro-units. `label` must evaluate to 0/1.
    */
  def trainLogistic(docs: DataFrame, label: Column, dims: Int = 32,
      iters: Int = 2, lr: Double = 0.5): (Array[Long], Long) = {
    require(dims > 0 && iters >= 1)
    // the feature map (split + one md5 per word) is compute-bound: spread
    // a one-split local scan across cores before it (no-op at scale —
    // see [[Spread]]); every GD pass then reads the checkpointed blocks
    // at that parallelism too
    val feats = Spread.forCpu(docs).select(col("doc_id"),
        featureBuckets(col("text"), dims).as("__graft_bks"),
        (label.cast("double") * Micro).cast("long").as("__graft_yu"))
      .localCheckpoint(true)
    val n = feats.count().toDouble
    var w = Array.fill(dims)(0L)
    var bias = 0L
    (1 to iters).foreach { _ =>
      // per-doc residual gu = round(sigmoid(margin)·1e6) − yu, with the
      // margin an EXACT long sum over the doc's buckets (in-row dot
      // against the weight literal); bucket −1 carries the bias gradient
      val gu = puExpr(col("__graft_bks"), w, bias) - col("__graft_yu")
      val grads = feats
        .select(explode(concat(col("__graft_bks"), array(lit(-1L)))).as("b"),
          gu.as("gu"))
        .groupBy(col("b")).agg(sum(col("gu")).as("gs"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      def step(prev: Long, gs: Long): Long =
        prev - roundHalfAway(lr * gs / n)
      w = Array.tabulate(dims)(i => step(w(i), grads.getOrElse(i.toLong, 0L)))
      bias = step(bias, grads.getOrElse(-1L, 0L))
    }
    (w, bias)
  }

  /** Micro-unit sigmoid of the margin of a bucket array under (w, bias):
    * `round(1e6 / (1 + exp(−(Σ w_b + bias)/1e6)))` as a long column.
    */
  private def puExpr(bks: Column, w: Array[Long], bias: Long): Column = {
    val wlit = array(w.map(lit(_)).toIndexedSeq: _*)
    val dot = aggregate(bks, lit(0L),
      (acc, b) => acc + element_at(wlit, (b + 1).cast("int")))
    val m = (dot + lit(bias)).cast("double") / lit(Micro.toDouble)
    round(lit(1.0) / (lit(1.0) + exp(-m)) * Micro, 0).cast("long")
  }

  /** Score every document under a trained model: label (0/1), the
    * 6dp-rounded sigmoid score, and the ≥ 0.5 decision. Pure narrow map.
    */
  def score(docs: DataFrame, label: Column, w: Array[Long], bias: Long,
      dims: Int): DataFrame = {
    val pu = puExpr(featureBuckets(col("text"), dims), w, bias)
    Spread.forCpu(docs).select(col("doc_id"),
      label.cast("long").as("label"),
      (pu.cast("double") / Micro).as("score"),
      (pu >= Micro / 2).as("predicted"))
  }

  /** Train-then-score in one call (the c05 surface). */
  def trainScore(docs: DataFrame, label: Column, dims: Int = 32,
      iters: Int = 2, lr: Double = 0.5): DataFrame = {
    val (w, bias) = trainLogistic(docs, label, dims, iters, lr)
    score(docs, label, w, bias, dims)
  }
}
