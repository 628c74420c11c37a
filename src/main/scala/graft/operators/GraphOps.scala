package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists the pipeline already produces — the
  * k-NN graph ([[Similarity.knnGraph]]) and the near-dup pair graph
  * ([[Dedup]]). The reference engine has no graph operators; this extends
  * the engine for graph-signal data curation (PageRank-style centrality is
  * a standard document-quality / representativeness signal over similarity
  * graphs). Complements [[Dedup.connectedComponents]] (min-label
  * propagation): that computes membership, this computes a per-vertex
  * score.
  */
object GraphOps {

  /** Fixed-iteration PageRank over a directed edge list `(src, dst)`.
    *
    * Semantics (classic damped PageRank with dangling-mass
    * redistribution):
    * `pr_{t+1}(v) = (1-d)/N + d * (Σ_{u→v} pr_t(u)/outdeg(u) + D_t/N)`
    * where `D_t` is the total rank held by vertices with no out-edges.
    * `vertices` supplies the full vertex set (a vertex may have no edges
    * at all and still holds rank).
    *
    * Scale shape: each iteration is ONE shuffle — the edges⋈ranks join on
    * `src` followed by a groupBy on `dst`; the per-iteration scalars
    * (vertex count, dangling mass) ride as broadcast single-row frames, so
    * nothing is collected to the driver and the loop is a fixed, small
    * number of stages. Edge out-degrees are joined once up front and the
    * weighted edge list checkpointed — iterations re-read that compact
    * relation, not the LSH pipeline that produced it. Rank frames are
    * checkpointed per iteration to truncate lineage (the standard guard
    * for iterative DataFrame algorithms; without it the plan doubles every
    * pass). Contribution sums go through DECIMAL(38,18) so the result is
    * order-independent and engine-exact, which is what lets a SQL oracle
    * replay the same iterations bit-stably.
    */
  def pageRank(edges: DataFrame, vertices: DataFrame,
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val verts = vertices.select(col("id")).distinct().localCheckpoint(true)
    // single-row broadcast frames: vertex count for the teleport term,
    // joined everywhere a scalar is needed — never collected
    val nDf = verts.agg(count(lit(1)).cast("double").as("n_v"))
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).cast("double").as("outdeg"))
    // compact weighted edge relation the loop re-reads each pass
    val edgesW = edges.select(col("src"), col("dst"))
      .join(outdeg, Seq("src"))
      .localCheckpoint(true)
    val exactSum = (c: org.apache.spark.sql.Column) =>
      sum(c.cast("decimal(38,18)")).cast("double")
    var pr = verts.crossJoin(broadcast(nDf))
      .select(col("id"), (lit(1.0) / col("n_v")).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to iterations) {
      val contrib = edgesW.join(pr, edgesW("src") === pr("id"))
        .groupBy(col("dst"))
        .agg(exactSum(col("pr") / col("outdeg")).as("mass"))
        .select(col("dst").as("id"), col("mass"))
      val dangling = pr.join(outdeg, pr("id") === outdeg("src"), "left_anti")
        .agg(coalesce(exactSum(col("pr")), lit(0.0)).as("d_mass"))
      pr = verts.join(contrib, Seq("id"), "left")
        .crossJoin(broadcast(nDf)).crossJoin(broadcast(dangling))
        .select(col("id"),
          ((lit(1.0) - lit(damping)) / col("n_v") +
            lit(damping) * (coalesce(col("mass"), lit(0.0)) +
              col("d_mass") / col("n_v"))).as("pr"))
        .localCheckpoint(true)
    }
    pr
  }

  /** Semi-supervised LABEL PROPAGATION over a directed edge list: seeds
    * keep their label (clamped); each iteration, every still-unlabeled
    * vertex takes the majority label among its labeled out-neighbors
    * (ties to the smallest label), or stays unlabeled if none are labeled
    * yet. The weak-labeling workhorse when a thin labeled set must cover
    * a large corpus through its similarity structure — [[Similarity
    * .knnClassify]]'s one-hop vote, iterated so labels REACH vertices
    * with no labeled neighbor of their own. `origin` records how each
    * vertex got its label (`seed` / `iter<i>`), the provenance a curation
    * pipeline keeps for confidence tiers.
    *
    * Scale shape: per iteration ONE join of the (k·N-row) edge list with
    * the labeled subset and one (vertex, label)-keyed count aggregate —
    * integer votes, so the argmax is engine-exact and a SQL oracle
    * replays every iteration. Label frames are checkpointed per pass to
    * truncate iterative lineage, as [[pageRank]] does.
    */
  def labelPropagate(edges: DataFrame, seeds: DataFrame, vertices: DataFrame,
      iterations: Int = 2): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    import org.apache.spark.sql.expressions.Window
    var labels = vertices.select(col("id")).distinct()
      .join(seeds.select(col("id"), col("label").cast("long").as("lbl")),
        Seq("id"), "left")
      .select(col("id"), col("lbl"),
        when(col("lbl").isNotNull, lit("seed")).as("origin"))
      .localCheckpoint(true)
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    (1 to iterations).foreach { i =>
      val votes = e
        .join(labels.filter(col("lbl").isNotNull)
          .select(col("id").as("dst"), col("lbl").as("nlbl")), "dst")
        .groupBy(col("src"), col("nlbl"))
        .agg(count(lit(1)).as("votes"))
      val w = Window.partitionBy(col("src"))
        .orderBy(col("votes").desc, col("nlbl"))
      val best = votes.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1)
        .select(col("src").as("id"), col("nlbl"))
      labels = labels.join(best, Seq("id"), "left")
        .select(col("id"),
          coalesce(col("lbl"), col("nlbl")).as("lbl"),
          coalesce(col("origin"),
            when(col("nlbl").isNotNull, lit(s"iter$i"))).as("origin"))
        .localCheckpoint(true)
    }
    labels
  }

  /** Label propagation over the k-NN similarity graph: the composed form
    * — knn edges + a seed predicate over the embeddings frame.
    */
  def knnLabelPropagate(emb: DataFrame, isSeed: org.apache.spark.sql.Column,
      k: Int = 5, planes: Int = 64, bands: Int = 16, dim: Int = -1,
      iterations: Int = 2): DataFrame = {
    val edges = Similarity.knnGraph(emb, k, planes, bands, dim)
      .select(col("qid").as("src"), col("nid").as("dst"))
    val seeds = emb.filter(isSeed)
      .select(col("vec_id").as("id"), col("label"))
    labelPropagate(edges, seeds, emb.select(col("vec_id").as("id")),
        iterations)
      .select(col("id").as("vec_id"), col("lbl").as("label"), col("origin"))
  }

  /** PageRank over the k-NN similarity graph of an embeddings frame — the
    * composed form a curation pipeline calls: LSH-bucketed k-NN edges
    * ([[Similarity.knnGraph]], never all-pairs) feed [[pageRank]], scoring
    * each vector's centrality in its similarity neighborhood. High-rank
    * vectors are prototypical (many near neighbors rank them); low-rank
    * vectors are outliers — both ends are standard selection signals.
    */
  def knnPageRank(emb: DataFrame, k: Int = 5, planes: Int = 64,
      bands: Int = 16, dim: Int = -1, iterations: Int = 3,
      damping: Double = 0.85): DataFrame = {
    val edges = Similarity.knnGraph(emb, k, planes, bands, dim)
      .select(col("qid").as("src"), col("nid").as("dst"))
    val verts = emb.select(col("vec_id").as("id"))
    pageRank(edges, verts, iterations, damping)
      .select(col("id").as("vec_id"), round(col("pr"), 9).as("pagerank"))
  }

  /** Per-vertex TRIANGLE COUNT and local clustering coefficient over a
    * directed edge list treated as a simple undirected graph — the
    * community-density signal next to [[pageRank]]'s centrality (dense
    * neighborhoods = redundant near-duplicate cliques; zero-triangle
    * vertices = isolated outliers).
    *
    * Scale shape (degree-oriented node-iterator, the standard distributed
    * formulation): every edge is ORIENTED from its lower-(degree, id)
    * endpoint to the higher one, so each triangle is found exactly once
    * at its order-lowest vertex, and — the part that matters at 100 TB —
    * the wedge self-join fans out per-vertex as out-degree², where
    * orientation caps out-degree at O(√E) for ANY degree distribution: a
    * hub with a million neighbors contributes almost no wedges because
    * nearly all its edges point INTO it. Three shuffles total (degree
    * agg, wedge join, closing-edge probe); the canonical edge relation is
    * checkpointed once for its three consumers.
    */
  def triangleCounts(edges: DataFrame, vertices: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // degrees + orientation + closing-edge probe
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("degree"))
    val withDeg = und
      .join(deg.select(col("id").as("a"), col("degree").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("degree").as("db")), Seq("b"))
    val lowFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
        when(lowFirst, col("a")).otherwise(col("b")).as("u"),
        when(lowFirst, col("b")).otherwise(col("a")).as("v"),
        when(lowFirst, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint(true) // wedge self-join + closing-edge probe
    val x = oriented.select(col("u"), col("v").as("v1"), col("dv").as("d1"))
    val y = oriented.select(col("u"), col("v").as("v2"), col("dv").as("d2"))
    val closeLow = col("d1") < col("d2") ||
      (col("d1") === col("d2") && col("v1") < col("v2"))
    val wedges = x.join(y, Seq("u")).filter(col("v1") < col("v2"))
      .select(col("u"), col("v1"), col("v2"),
        when(closeLow, col("v1")).otherwise(col("v2")).as("ws"),
        when(closeLow, col("v2")).otherwise(col("v1")).as("wd"))
    val tri = wedges.join(oriented
        .select(col("u").as("ws"), col("v").as("wd")), Seq("ws", "wd"))
      .select(col("u"), col("v1"), col("v2")) // each triangle exactly once
    val perV = tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
    vertices.select(col("id")).distinct()
      .join(deg, Seq("id"), "left")
      .join(perV, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("degree"), lit(0L)).cast("long").as("degree"),
        coalesce(col("triangles"), lit(0L)).cast("long").as("triangles"),
        when(coalesce(col("degree"), lit(0L)) >= 2,
          lit(2.0) * coalesce(col("triangles"), lit(0L)).cast("double") /
            (col("degree").cast("double") *
              (col("degree").cast("double") - 1.0)))
          .otherwise(lit(0.0)).as("clustering"))
  }

  /** Triangle census over the k-NN similarity graph of an embeddings
    * frame — [[triangleCounts]] on [[Similarity.knnGraph]] edges, the
    * composed near-duplicate-clique / outlier detector.
    */
  def knnTriangles(emb: DataFrame, k: Int = 5, planes: Int = 64,
      bands: Int = 16, dim: Int = -1,
      maxBucketSize: Long = Long.MaxValue): DataFrame = {
    val edges = Similarity.knnGraph(emb, k, planes, bands, dim, maxBucketSize)
      .select(col("qid").as("src"), col("nid").as("dst"))
    triangleCounts(edges, emb.select(col("vec_id").as("id")))
      .select(col("id").cast("long").as("vec_id"), col("degree"),
        col("triangles"), col("clustering"))
  }
}
