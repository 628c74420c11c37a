package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * Scale design: queries are broadcast (they are few); the corpus streams
  * through one narrow pass computing dots via codegen'd higher-order array
  * functions — no N x N shuffle, no explode of the dense dimension. Top-k is
  * a per-query window over the candidate set. The IVF variant prunes the
  * corpus to the probed coarse cells (label column as the cell id) before
  * the same scoring pass.
  */
object Similarity {

  /** Cosine similarity between two array<float/double> columns, computed by
    * ordered fold (deterministic summation order).
    *
    * Composable-function form, kept as the portable reference
    * implementation; the hot paths use [[nativeCosine]], a fused
    * zero-allocation Catalyst expression with identical semantics
    * (graft.functions.CosineSimilarity).
    */
  def cosine(a: Column, b: Column): Column = {
    // multiply in double precision: float*float products drift ~1e-7 from
    // the double-computed oracle, enough to flip a 4dp rounding
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Codegen'd single-pass cosine (requires the session's registry to hold
    * the native function — registered idempotently per session).
    */
  private def nativeCosine(spark: SparkSession)(a: Column, b: Column): Column = {
    graft.functions.NativeFunctions.register(spark)
    call_function("cosine_sim", a, b)
  }

  /** Brute-force top-k cosine neighbors for each query vector (exact
    * baseline). Output: (qid, nid, rank, cos_sim rounded to 4dp).
    */
  def bruteForceTopK(emb: DataFrame, isQuery: Column, k: Int = 10): DataFrame = {
    val cos = nativeCosine(emb.sparkSession) _
    val queries = emb.filter(isQuery)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val sims = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"))
      .crossJoin(broadcast(queries))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos_sim", cos(col("qvec"), col("nvec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("nid"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** IVF-style ANN: coarse cells from the corpus's label column (centroid =
    * per-cell mean vector), probe the nProbe nearest cells per query, then
    * exact-score only vectors in probed cells. Sub-linear scan at scale when
    * cells >> nProbe.
    */
  def ivfTopK(emb: DataFrame, isQuery: Column, k: Int = 10, nProbe: Int = 2): DataFrame = {
    val cos = nativeCosine(emb.sparkSession) _
    val dims = emb.select(col("vec_id"), col("label"),
      posexplode(col("embedding")).as(Seq("i", "v")))
    val centroids = dims.groupBy(col("label"), col("i"))
      .agg(avg(col("v")).as("cv"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("cv")))),
        s => s.getField("cv")).as("centroid"))
    val queries = emb.filter(isQuery)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val probed = queries.crossJoin(broadcast(centroids))
      .withColumn("csim", cos(col("qvec"), col("centroid")))
      .withColumn("crank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("label"))))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("qvec"), col("label"))
    val cand = emb.select(col("vec_id").as("nid"), col("embedding").as("nvec"),
        col("label"))
      .join(broadcast(probed), Seq("label"))
      .filter(col("nid") =!= col("qid"))
      .withColumn("cos_sim", cos(col("qvec"), col("nvec")))
    cand.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("cos_sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("rank"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Embedding near-duplicate pairs: all pairs above a cosine threshold.
    * Exact quadratic baseline with the broadcast on one side; the scale
    * path is LSH bucketing (random hyperplanes) — see `simhashPlanes`.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val cos = nativeCosine(emb.sparkSession) _
    val a = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
    val b = emb.select(col("vec_id").as("b"), col("embedding").as("vb"))
    a.join(b, col("a") < col("b"))
      .withColumn("cos_sim", cos(col("va"), col("vb")))
      .filter(col("cos_sim") > threshold)
      .select(col("a"), col("b"), round(col("cos_sim"), 4).as("cos_sim"))
  }
}
