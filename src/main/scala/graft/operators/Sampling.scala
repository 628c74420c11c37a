package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling and eval-set screening — the selection
  * operators a training-data pipeline applies after cleaning/dedup:
  *
  *  - hash-Bernoulli sampling: keep a row iff a 16-bit bucket of the
  *    md5 of its key falls under the rate. Purely narrow (a filter the
  *    optimizer pushes to the scan side of any later join), reproducible
  *    across runs/engines, and stable under repartitioning — unlike
  *    `df.sample`, which depends on partition layout and a seed.
  *  - stratified sampling: per-stratum rates (e.g. downsample a dominant
  *    language) joined in from a broadcast rates table, then the same
  *    narrow hash filter. The corpus never shuffles.
  *  - contamination screening: flag corpus documents whose normalized
  *    fingerprint appears in a benchmark/eval set, so test data can be
  *    held out of training corpora. The benchmark side is tiny by nature
  *    and broadcasts; the corpus side is one narrow pass + hash lookup.
  *
  * The md5 bucket is engine-portable (DuckDB: `('0x' ||
  * substring(md5(k),1,4))::BIGINT`), so every operator is oracle-checked
  * end to end like the dedup family.
  */
object Sampling {

  /** Uniform 16-bit bucket [0, 65536) from the md5 of the key's string
    * form.
    */
  def bucket16(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")

  /** Deterministic Bernoulli sample at `rate` keyed on `key`. */
  def hashBernoulli(df: DataFrame, key: Column, rate: Double): DataFrame =
    df.filter(bucket16(key) < lit(rate) * 65536d)

  /** Per-stratum deterministic sampling. Strata absent from `rates` are
    * dropped (rate 0). The rates relation is rows-per-stratum small, so it
    * broadcasts; the data side stays narrow end to end.
    */
  def stratified(df: DataFrame, strata: Column, key: Column,
      rates: Map[String, Double]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // collision-proof internal names + alias-qualified references, so an
    // input that already has a `stratum`/`rate` column neither collides
    // nor gets dropped
    val rdf = rates.toSeq.toDF("__graft_stratum", "__graft_rate").as("__graft_rates")
    df.join(broadcast(rdf), strata === rdf("__graft_stratum"))
      .filter(bucket16(key) < rdf("__graft_rate") * 65536d)
      .drop("__graft_stratum", "__graft_rate")
  }

  /** Source mixing: resample the corpus so each source's share of the
    * output approaches its target weight, inside a global `budget` fraction
    * of the corpus. A source's keep-rate is
    * `min(1, budget * N * w_s / (sumW * n_s))` — proportional targets
    * capped at keeping everything (an under-represented source can't be
    * up-sampled, only kept whole). Sources absent from `targets` are
    * dropped, like [[stratified]].
    *
    * Fully distributed: per-source counts are one map-side-combined
    * aggregate over the corpus; the rates relation (one row per source)
    * broadcasts back for a narrow hash filter — the corpus itself never
    * shuffles, and nothing round-trips through the driver. The arithmetic
    * is plain left-associated double math so a SQL oracle replays the
    * exact rates.
    */
  def sourceMix(df: DataFrame, source: Column, key: Column,
      targets: Map[String, Double], budget: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(source.as("__graft_src"))
      .agg(count(lit(1)).as("__graft_n"))
    val total = df.agg(count(lit(1)).as("__graft_total"))
    val tdf = targets.toSeq.toDF("__graft_tsrc", "__graft_w")
    val sumW = targets.values.sum
    val rates = counts
      .join(broadcast(tdf), col("__graft_src") === col("__graft_tsrc"))
      .crossJoin(broadcast(total))
      .select(col("__graft_src"),
        least(lit(1.0),
          lit(budget) * col("__graft_total") * col("__graft_w") /
            (lit(sumW) * col("__graft_n"))).as("__graft_rate"))
    df.join(broadcast(rates), source === col("__graft_src"))
      .filter(bucket16(key) < col("__graft_rate") * 65536d)
      .drop("__graft_src", "__graft_rate")
  }

  /** Temperature-scaled source mixing (the multilingual τ-sampling rule,
    * Conneau & Lample 2019 / mBERT exponential smoothing): source s with
    * corpus share p_s is resampled toward q_s ∝ p_s^τ inside a global
    * `budget` fraction. τ = 1 keeps natural proportions; τ → 0 flattens
    * toward uniform (boosting low-resource sources' relative share); the
    * keep-rate is `min(1, budget·N·q_s / n_s)` — no up-sampling, like
    * [[sourceMix]].
    *
    * Same scale shape as [[sourceMix]]: per-source counts via one
    * map-side-combined aggregate, rates broadcast back, selection by the
    * narrow deterministic hash filter — the corpus never shuffles. The
    * arithmetic is plain left-associated double math (one POWER per
    * source) so a SQL oracle replays the exact rates.
    */
  def temperatureMix(df: DataFrame, source: Column, key: Column,
      tau: Double, budget: Double): DataFrame = {
    require(tau > 0, "tau must be positive (tau=1 is natural proportions)")
    val counts = df.groupBy(source.as("__graft_src"))
      .agg(count(lit(1)).cast("double").as("__graft_n"))
    val total = df.agg(count(lit(1)).cast("double").as("__graft_total"))
    val pw = counts.crossJoin(broadcast(total))
      .select(col("__graft_src"), col("__graft_n"), col("__graft_total"),
        pow(col("__graft_n") / col("__graft_total"), tau).as("__graft_pt"))
    val z = pw.agg(sum(col("__graft_pt")).as("__graft_z"))
    val rates = pw.crossJoin(broadcast(z))
      .select(col("__graft_src"),
        least(lit(1.0),
          lit(budget) * col("__graft_total") *
            (col("__graft_pt") / col("__graft_z")) / col("__graft_n"))
          .as("__graft_rate"))
    df.join(broadcast(rates), source === col("__graft_src"))
      .filter(bucket16(key) < col("__graft_rate") * 65536d)
      .drop("__graft_src", "__graft_rate")
  }

  /** Importance-weighted deterministic Bernoulli: keep probability
    * proportional to `weight / scale`, capped at 1 — the loss-weighted /
    * length-weighted selection shape (longer or higher-value docs kept at
    * higher rates) with the same rerun-stable hash filter as
    * [[hashBernoulli]]. Pure narrow arithmetic; no shuffle, no state.
    */
  def weightedBernoulli(df: DataFrame, key: Column, weight: Column,
      scale: Double): DataFrame = {
    require(scale > 0, "scale must be positive")
    df.filter(bucket16(key) <
      least(lit(1.0), weight.cast("double") / lit(scale)) * 65536d)
  }

  /** Deterministic disjoint split (train/val/test …): each row is assigned
    * the first label whose cumulative fraction bound its hash bucket falls
    * under. Pure per-row hash arithmetic — no shuffle, no state, stable
    * under reruns and re-partitioning, and rows never leak across splits
    * because the bucket intervals partition [0, 65536).
    */
  def split(df: DataFrame, key: Column, fracs: Seq[(String, Double)]): DataFrame = {
    require(fracs.nonEmpty && fracs.forall(_._2 > 0), "fractions must be positive")
    require(math.abs(fracs.map(_._2).sum - 1.0) < 1e-9, "fractions must sum to 1")
    val b = bucket16(key)
    val cum = fracs.map(_._1).zip(fracs.scanLeft(0.0)(_ + _._2).tail)
    val first = when(b < lit(cum.head._2 * 65536), lit(cum.head._1))
    val assigned = cum.tail.init
      .foldLeft(first) { case (acc, (n, c)) => acc.when(b < lit(c * 65536), lit(n)) }
      .otherwise(lit(cum.last._1))
    df.withColumn("split", assigned)
  }

  /** Cap any single group's contribution at `cap` rows, keeping a
    * deterministic hash-ordered prefix (so the kept subset is an unbiased,
    * reproducible sample of the group rather than whatever the scan order
    * yields). The domain-cap / per-source-cap operator of web curation
    * pipelines. `key` must be an orderable atomic column that is unique
    * per row (it breaks hash-bucket ties, so results are exact across
    * engines and runs).
    *
    * Two-phase, because groups at web scale are heavy-tailed — the whole
    * point of the cap — and a bare window inherits exactly that skew:
    *
    *  - Phase 1 (map-side, NO shuffle): within each input partition keep
    *    at most `cap` rows per group via a bounded heap under the same
    *    (bucket, key) total order the final window uses. The
    *    per-partition winners are a superset of the global winners under
    *    a total order, so nothing the final window would keep is lost —
    *    but a hot group now ships at most `cap` rows PER MAP TASK into
    *    the shuffle instead of all its rows.
    *  - Phase 2: the exact row_number window over the ≤ cap × partitions
    *    survivors per group.
    */
  def capPerGroup(df: DataFrame, group: Column, key: Column, cap: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.expressions.Window
    val staged = df
      .withColumn("__graft_ord", bucket16(key))
      .withColumn("__graft_grp", group)
      .withColumn("__graft_key", key)
    val schema = staged.schema
    val oi = schema.fieldIndex("__graft_ord")
    val gi = schema.fieldIndex("__graft_grp")
    val ki = schema.fieldIndex("__graft_key")
    // ascending (bucket, key); null keys sort first, matching the window's
    // default ASC NULLS FIRST
    def cmp(a: Row, b: Row): Int = {
      val c1 = java.lang.Long.compare(a.getLong(oi), b.getLong(oi))
      if (c1 != 0) c1
      else (a.get(ki), b.get(ki)) match {
        case (null, null) => 0
        case (null, _) => -1
        case (_, null) => 1
        case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
      }
    }
    val asc: Ordering[Row] = (a, b) => cmp(a, b)
    val pruned = staged.mapPartitions { it =>
      // group value -> max-heap of the `cap` smallest rows seen so far
      // (dequeue = current worst kept); state is bounded at cap rows per
      // group resident in this partition
      val heaps = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[Row]]
      it.foreach { r =>
        val g = r.get(gi)
        val h = heaps.getOrElseUpdate(g,
          scala.collection.mutable.PriorityQueue.empty(asc))
        h.enqueue(r)
        if (h.size > cap) { h.dequeue(); () }
      }
      heaps.valuesIterator.flatMap(_.iterator)
    }(Encoders.row(schema))
    val w = Window.partitionBy(col("__graft_grp"))
      .orderBy(col("__graft_ord"), col("__graft_key"))
    pruned.withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= cap)
      .drop("__graft_ord", "__graft_grp", "__graft_key", "__graft_rn")
  }

  /** Epoch-repeat mixing under a global size budget — the data-constrained
    * regime (Muennighoff et al. 2023): when a source's allocation exceeds
    * its corpus size, REPEAT it (up to `maxEpochs` passes) instead of
    * starving the mix. Source s with target weight w_s gets a budget share
    * `budget·w_s/Σw`; its repeat factor is
    * `r_s = min(maxEpochs, share_s / size_s)` where size_s is the source's
    * total of `sizeCol` (tokens, chars — any additive unit the budget is
    * denominated in). Every row emits `floor(r_s)` full epochs, plus one
    * extra epoch for the deterministic hash-Bernoulli fraction
    * `r_s − floor(r_s)` of rows — so each source's expected emitted size
    * is exactly its allocation, capped at `maxEpochs` epochs.
    *
    * Output: input columns plus `epoch` (0-based pass number). A row
    * absent from the partial epoch and with `floor(r_s) = 0` is dropped —
    * the down-sampling case degenerates to [[sourceMix]]'s behavior.
    *
    * Shape at 100 TB: one map-side-combined aggregate for per-source
    * sizes, a broadcast rates relation, then a NARROW per-row explode of
    * `sequence(0, n_copies−1)` — the corpus never shuffles, and the
    * explode's fan-out is the repeat factor itself (bounded by
    * `maxEpochs`), which is the output's size by definition. Plain
    * left-associated double math throughout so a SQL oracle replays the
    * exact rates.
    */
  def epochMix(df: DataFrame, source: Column, key: Column, sizeCol: Column,
      targets: Map[String, Double], budget: Double, maxEpochs: Int): DataFrame = {
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    require(budget > 0, "budget must be positive (in sizeCol units)")
    val spark = df.sparkSession
    import spark.implicits._
    val sizes = df.groupBy(source.as("__graft_src"))
      .agg(sum(sizeCol.cast("double")).as("__graft_size"))
    val tdf = targets.toSeq.toDF("__graft_tsrc", "__graft_w")
    val sumW = targets.values.sum
    val rates = sizes
      .join(broadcast(tdf), col("__graft_src") === col("__graft_tsrc"))
      .select(col("__graft_src"),
        least(lit(maxEpochs.toDouble),
          lit(budget) * col("__graft_w") / (lit(sumW) * col("__graft_size")))
          .as("__graft_r"))
      .select(col("__graft_src"),
        floor(col("__graft_r")).cast("long").as("__graft_full"),
        (col("__graft_r") - floor(col("__graft_r"))).as("__graft_frac"))
    df.join(broadcast(rates), source === col("__graft_src"))
      .withColumn("__graft_ncopies",
        col("__graft_full") +
          when(bucket16(key) < col("__graft_frac") * 65536d, lit(1L))
            .otherwise(lit(0L)))
      .filter(col("__graft_ncopies") > 0)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("__graft_ncopies") - 1)))
      .drop("__graft_src", "__graft_full", "__graft_frac", "__graft_ncopies")
  }

  /** Flag corpus rows whose fingerprint appears in the benchmark set
    * (contamination against eval data). `benchmarkFps` must expose a
    * single `fp` column; it is deduped and broadcast. The output carries
    * the computed fingerprint as `fp` and the flag as `contaminated`
    * (overwriting same-named input columns, as `withColumn` semantics go);
    * the join key itself is an internal name that cannot collide.
    */
  def contaminationScreen(corpus: DataFrame, fp: Column,
      benchmarkFps: DataFrame): DataFrame = {
    val bench = broadcast(
      benchmarkFps.select(col("fp").as("__graft_bench_fp")).distinct())
    corpus.withColumn("fp", fp)
      .join(bench, col("fp") === col("__graft_bench_fp"), "left")
      .withColumn("contaminated", col("__graft_bench_fp").isNotNull)
      .drop("__graft_bench_fp")
  }

  /** N-gram collision decontamination (the GPT-3 method, Brown et al.
    * 2020 appendix C: flag training documents sharing any n-gram with an
    * eval set — they used 13-grams; `n` is the caller's dial and defaults
    * to the corpus's shingle size here). The whole-document fingerprint
    * screen ([[contaminationScreen]]) misses PARTIAL leakage — an eval
    * question quoted inside a larger page — which is exactly what n-gram
    * collision catches. Reports per-document collision counts and the
    * contaminated-gram fraction, so pipelines can threshold (≥ 1 gram =
    * GPT-3's rule) or rank.
    *
    * Shape at 100 TB: both sides build distinct 8-byte gram keys IN-ROW
    * (`shingle_hashes` — gram strings never leave their row); the eval
    * side is tiny by nature, deduped and broadcast; the corpus side is
    * one narrow explode, a broadcast hash lookup, and one groupBy(doc_id)
    * with map-side combine — no corpus shuffle keyed on grams, no
    * pair expansion. Same 64-bit key-collision caveat as the dedup
    * family (a collision can only over-flag, never miss).
    */
  /** N-gram decontamination behind a Bloom-filter runtime prefilter — the
    * shape for when the eval-gram set is too big to broadcast (a full eval
    * harness at 13-grams runs to hundreds of millions of keys; a hash
    * relation that size forces [[ngramContaminationScreen]]'s broadcast
    * into a corpus-wide shuffle join on gram keys). The Bloom filter
    * stands in for the broadcast: ~1.2 bytes/key at 1 % fpp, so 100M eval
    * grams ride to every executor in ~120 MB, and only grams the bloom
    * accepts — true collisions plus the fpp sliver of clean grams — enter
    * the exact verification join. The result is EXACT (bit-identical to
    * the broadcast path): the bloom can only pass extra candidates, and
    * the exact join then rejects its false positives, so the output never
    * depends on fpp. This is the runtime-filter pattern Spark's own
    * InjectRuntimeFilter applies to selective joins, made explicit where
    * the optimizer can't see the selectivity.
    *
    * Shape at 100 TB: per-doc gram counts come from in-row `size()` (the
    * corpus is never exploded for counting); the exploded side is
    * filtered by the broadcast bloom BEFORE the exact shuffle join, so
    * shuffle volume is collisions + fpp·clean, not the corpus's full gram
    * stream. Same 64-bit key-collision caveat as the dedup family.
    */
  def bloomNgramDecontaminate(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 5, fpp: Double = 0.01): DataFrame = {
    graft.functions.NativeFunctions.register(corpus.sparkSession)
    val spark = corpus.sparkSession
    // distinct eval gram keys, materialized once: sized for the bloom fit,
    // reused as the exact join's build side
    val bench = benchmark
      .select(explode(call_function("shingle_hashes", col("text"), lit(n)))
        .as("__graft_bench_gk"))
      .distinct()
      .localCheckpoint(true)
    val nItems = math.max(bench.count(), 1L)
    val bloom = bench.stat.bloomFilter("__graft_bench_gk", nItems, fpp)
    val bloomB = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bloomB.value.mightContainLong(k))
    val withGrams = corpus
      .select(col("doc_id"),
        call_function("shingle_hashes", col("text"), lit(n)).as("__graft_gks"))
    // explode → bloom gate → EXACT verify join (hinted shuffle-hash: this
    // operator exists for the eval set that can't broadcast) → per-doc count
    val hits = withGrams
      .select(col("doc_id"), explode(col("__graft_gks")).as("gk"))
      .filter(mightContain(col("gk")))
      .join(bench.hint("shuffle_hash"),
        col("gk") === col("__graft_bench_gk"), "left_semi")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated"))
    withGrams
      .select(col("doc_id"),
        coalesce(size(col("__graft_gks")), lit(0)).cast("long").as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(col("n_grams") > 0,
          coalesce(col("n_contaminated"), lit(0L)).cast("double") /
            col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("contamination_frac"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).as("contaminated"))
  }

  def ngramContaminationScreen(corpus: DataFrame, benchmark: DataFrame,
      n: Int = 3): DataFrame = {
    graft.functions.NativeFunctions.register(corpus.sparkSession)
    val bench = broadcast(Spread.forCpu(benchmark)
      .select(explode(call_function("shingle_hashes", col("text"), lit(n)))
        .as("__graft_bench_gk"))
      .distinct())
    val per = Spread.byKey(corpus, col("doc_id"))
      .select(col("doc_id"),
        explode(call_function("shingle_hashes", col("text"), lit(n))).as("gk"))
      .join(bench, col("gk") === col("__graft_bench_gk"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        count(col("__graft_bench_gk")).as("n_contaminated"))
    corpus.select(col("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          coalesce(col("n_contaminated"), lit(0L)).cast("double") /
            col("n_grams").cast("double"))
          .otherwise(lit(0.0)).as("contamination_frac"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).as("contaminated"))
  }
}
