package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding quantization: per-dimension affine int8 — the standard 4×
  * memory/bandwidth cut for corpus-scale embedding stores (and the
  * precondition for cache-resident ANN at 100 TB).
  *
  * Two passes, both scale-clean:
  *   1. per-dimension min/max — one aggregation whose output is dim rows
  *      (bytes, not data), collected to the driver;
  *   2. a purely narrow per-row `transform` against the stats as literal
  *      arrays — no join, no shuffle, whole-stage codegen.
  *
  * Quantized values are integers, so results hash exactly across engines
  * (the DuckDB oracle replays the identical double arithmetic:
  * `round((v - mn) * 255 / (mx - mn))`).
  */
object Quantize {

  /** Per-dimension (min, max) over the corpus, ordered by dimension. */
  def int8Stats(emb: DataFrame): Array[(Double, Double)] =
    emb.select(posexplode(col("embedding")).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(min(col("v").cast("double")).as("mn"),
        max(col("v").cast("double")).as("mx"))
      .orderBy(col("i"))
      .collect()
      .map(r => (r.getDouble(1), r.getDouble(2)))

  private def quantExpr(vec: Column, mns: Seq[Double], mxs: Seq[Double],
      levels: Double = 255.0): Column =
    transform(vec, (v, i) => {
      val mn = element_at(typedlit(mns), i + 1)
      val mx = element_at(typedlit(mxs), i + 1)
      when(mx === mn, lit(0L))
        .otherwise(round((v.cast("double") - mn) * levels / (mx - mn)).cast("long"))
    })

  /** (vec_id, qvec) with qvec ∈ [0, 255]^dim. Constant dimensions map
    * to 0.
    */
  def int8(emb: DataFrame): DataFrame = {
    val stats = int8Stats(emb)
    emb.select(col("vec_id"),
      quantExpr(col("embedding"), stats.map(_._1).toSeq,
        stats.map(_._2).toSeq).as("qvec"))
  }

  /** INT4 with NIBBLE PACKING: the same per-dimension affine map at 16
    * levels, then two 4-bit codes packed per byte — 64 float32 dims
    * become 32 bytes, the 8× cut that makes billion-vector indexes
    * memory-resident (the compressed-storage half of the int8/PQ/BQ
    * family; dequantize is the same inverse map at 15). Both the
    * quantize and the pack are per-row array transforms inside codegen:
    * zero shuffles beyond [[int8Stats]]' dim-sized aggregate. Requires an
    * even dimension (packing is positional).
    *
    * Output long-form (vec_id, byte index j, packed byte b = hi·16+lo)
    * so an oracle checks the exact storage bytes, not a summary.
    */
  def int4Packed(emb: DataFrame): DataFrame = {
    val stats = int8Stats(emb)
    require(stats.length % 2 == 0,
      s"int4 packing needs an even dimension, got ${stats.length}")
    val mns = stats.map(_._1).toSeq
    val mxs = stats.map(_._2).toSeq
    // quantize PER ELEMENT inside the pack expression rather than staging
    // a q4 array column: projection collapse would substitute a staged
    // array's full dim-sized transform into every one of the d/2 byte
    // expressions (O(d²) work per row — observed 18× slower); this form
    // touches exactly two embedding elements per byte
    def quantAt(idx: Column): Column = {
      val mn = element_at(typedlit(mns), idx)
      val mx = element_at(typedlit(mxs), idx)
      val v = element_at(col("embedding"), idx).cast("double")
      when(mx === mn, lit(0L))
        .otherwise(round((v - mn) * 15.0 / (mx - mn)).cast("long"))
    }
    emb.select(col("vec_id"),
        transform(sequence(lit(0), lit(stats.length / 2 - 1)), j =>
          quantAt(j * 2 + 1) * 16 + quantAt(j * 2 + 2)).as("packed"))
      .select(col("vec_id"), posexplode(col("packed")).as(Seq("j", "b")))
      .select(col("vec_id"), col("j").cast("long").as("j"), col("b"))
  }

  /** Inverse map for error analysis: v̂_i = mn_i + q_i·(mx_i − mn_i)/255. */
  def dequantize(qvec: Column, stats: Array[(Double, Double)]): Column =
    transform(qvec, (q, i) => {
      val mn = element_at(typedlit(stats.map(_._1).toSeq), i + 1)
      val mx = element_at(typedlit(stats.map(_._2).toSeq), i + 1)
      mn + q.cast("double") * (mx - mn) / 255.0
    })

  /** Product quantization (Jégou et al. 2011, "Product quantization for
    * nearest neighbor search"): split the d-dim embedding into `m`
    * contiguous sub-blocks and k-means each block independently with L2
    * distance; a vector compresses to `m` code ids (d floats → m
    * log₂k-bit codes — the codebook form ANN-with-asymmetric-distance
    * builds on, one step beyond [[int8]]'s 4× affine cut).
    *
    * Deterministic construction mirroring [[Similarity.kmeansAssign]] so a
    * SQL oracle replays the whole fit: per block, seed centroids are the k
    * lowest vec_ids' sub-vectors (code id = seed vec_id), assignment is
    * argmin squared-L2 with ties to the lower code, and the centroid
    * update rounds to 6dp (killing summation-order noise across engines).
    * Output is long format (vec_id, block, code, dist2-to-centroid
    * rounded to 4dp).
    *
    * Scale shape: codebooks are m × k × (d/m) doubles = k × d — driver
    * state identical in size to plain k-means, independent of the corpus.
    * Fitting is `iters` bounded-output aggregates (codebook rows, not
    * data); the final assignment is ONE narrow pass where all m blocks'
    * argmins evaluate per-row inside codegen — no explode of the
    * dimension axis, no shuffle.
    */
  def productQuantize(emb: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 2, dim: Int = 0): DataFrame = {
    val (sub, books) = fitCodebooks(emb, m, k, iters, dim)
    // final assignment: one narrow projection PER BLOCK, unioned — the
    // same codegen-size reasoning as the fit (all m×k kernels in one
    // projection drop out of whole-stage codegen); each branch is a
    // k-kernel fold that stays compiled, and the m-way scan repeat is
    // cheaper than interpreted evaluation by a wide margin
    (0 until books.length).map { b =>
      val (code, d2) = nearestCode(books(b), blockSlice(b, sub))
      emb.select(col("vec_id"), lit(b.toLong).as("block"),
        code.as("code"), round(d2, 4).as("dist2"))
    }.reduce(_ union _)
  }

  /** The b-th sub-vector of the `embedding` column (1-based slice). */
  private[operators] def blockSlice(b: Int, sub: Int): Column =
    slice(col("embedding").cast("array<double>"), b * sub + 1, sub)

  /** Fit the [[productQuantize]] codebooks and return (subDim, per-block
    * codebook sorted by code id). Driver state is k × d doubles total.
    */
  def fitCodebooks(emb: DataFrame, m: Int = 4, k: Int = 16,
      iters: Int = 2, dim: Int = 0): (Int, IndexedSeq[Seq[(Long, Seq[Double])]]) = {
    require(m > 0 && k > 0 && iters > 0, "m, k, iters must be positive")
    graft.functions.NativeFunctions.register(emb.sparkSession)
    val d = if (dim > 0) dim else emb.select(size(col("embedding"))).head.getInt(0)
    require(d % m == 0, s"dim $d must split evenly into $m blocks")
    val sub = d / m
    def subVec(b: Int): Column = blockSlice(b, sub)
    // ONE seed collect serves all m codebooks; the per-iteration centroid
    // refresh stays one bounded-output aggregate PER BLOCK — a fused
    // all-blocks projection (m × k distance kernels in one select) was
    // measured 2.5× SLOWER: the giant generated method falls out of
    // whole-stage codegen into interpreted evaluation, costing far more
    // than the extra m-1 job launches save
    var books: IndexedSeq[Seq[(Long, Seq[Double])]] = {
      val seeds = emb.orderBy(col("vec_id")).limit(k)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("e"))
        .collect().toSeq
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq)
      (0 until m).map(b => seeds.map { case (id, e) =>
        id -> e.slice(b * sub, (b + 1) * sub) })
    }
    for (_ <- 1 until iters) {
      books = (0 until m).map { b =>
        val (code, _) = nearestCode(books(b), subVec(b))
        emb.select(code.as("code"), posexplode(subVec(b)).as(Seq("j", "v")))
          .groupBy(col("code"), col("j"))
          .agg(round(avg(col("v")), 6).as("cv"))
          .collect().toSeq
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
          .groupBy(_._1).toSeq
          .map { case (c, rows) => c -> rows.sortBy(_._2).map(_._3).toSeq }
          .sortBy(_._1)
      }
    }
    (sub, books)
  }

  /** Per-row argmin squared-L2 against the codebook literals — the same
    * linear fold shape as `Similarity.nearestCentroid` (a `when`-chain
    * would duplicate subtrees exponentially). The distance kernel is the
    * native fused `l2_sq` ([[graft.functions.SquaredL2]]) — sequential
    * array-order accumulation, bit-identical to the composable
    * `aggregate(zip_with(...))` fold it replaced, 3× end-to-end faster
    * on the PQ passes. Strictly-less keeps the FIRST minimum, so with
    * the codebook sorted by code id the lowest code wins exact ties —
    * matching `ROW_NUMBER ... ORDER BY d2, code`.
    */
  private[operators] def nearestCode(cents: Seq[(Long, Seq[Double])],
      sv: Column): (Column, Column) = {
    val stype = "struct<d2:double,code:bigint>"
    val scored = array(cents.map { case (cid, v) =>
      struct(
        call_function("l2_sq", sv, typedlit(v)).as("d2"),
        lit(cid).as("code")).cast(stype)
    }: _*)
    val best = aggregate(scored,
      struct(lit(Double.MaxValue).as("d2"), lit(-1L).as("code")).cast(stype),
      (acc, s) => when(s.getField("d2") < acc.getField("d2"), s).otherwise(acc))
    (best.getField("code"), best.getField("d2"))
  }

  // ------------------------------------------------------------------
  // Binary quantization: one sign bit per dimension, packed into a
  // BIGINT — 8 bytes per vector whatever the original dimension (here the
  // first 62 dims; bit i-1 set iff v_i >= 0). The crudest and cheapest
  // vector code: a 100 TB embedding corpus collapses to GBs of codes, and
  // candidate search is XOR+popcount, both codegen'd single instructions.

  /** Pack the sign bits of the first `bits` dims (≤ 62 to stay in a
    * positive BIGINT) in-row — a pure narrow map, no explode.
    */
  def binaryQuantize(emb: DataFrame, bits: Int = 62): DataFrame = {
    require(bits > 0 && bits <= 62, "bits must be in [1, 62]")
    emb.select(col("vec_id"), expr(
      s"""aggregate(
         |  transform(sequence(1, $bits), i ->
         |    IF(element_at(embedding, i) >= CAST(0 AS FLOAT),
         |       shiftleft(CAST(1 AS BIGINT), i - 1), CAST(0 AS BIGINT))),
         |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin).as("bits"))
  }

  /** Hamming-distance top-k over the packed codes: queries broadcast, the
    * corpus side scans CODES ONLY (xor + popcount per candidate), ranked
    * (hamming asc, nid asc) per query. The exact-rerank composition is
    * [[graft.operators.Similarity.recallAtK]]'s job; this is the
    * candidate stage a binary-quantized index runs at full corpus width.
    */
  def binaryTopK(emb: DataFrame, isQuery: Column, k: Int = 10,
      bits: Int = 62): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bq = binaryQuantize(emb, bits)
    val q = bq.filter(isQuery)
      .select(col("vec_id").as("qid"), col("bits").as("qbits"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("hamming"), col("nid"))
    bq.select(col("vec_id").as("nid"), col("bits").as("nbits"))
      .crossJoin(broadcast(q))
      .filter(col("nid") =!= col("qid"))
      .withColumn("hamming", expr("bit_count(qbits ^ nbits)").cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), col("hamming"))
  }
}
