package graft

import org.apache.spark.sql.functions._

import graft.operators.{Fuzzy, GraphOps, TextOps}

/** Semantics of the graph-signal, fuzzy-matching, and retrieval-scoring
  * operators on hand-analyzable fixtures, plus the plan properties that
  * keep them viable at scale.
  */
class GraphFuzzySpec extends SparkSpec {

  test("pageRank: one hand-computed iteration, dangling mass redistributed") {
    val s = spark
    import s.implicits._
    // cycle 1→2→3→1 plus 1→4; vertex 4 is dangling (no out-edges)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L, 4L).toDF("id")
    val pr1 = GraphOps.pageRank(edges, verts, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // pr0 = 0.25 each; dangling D = pr0(4) = 0.25
    // pr1(v) = 0.15/4 + 0.85*(mass(v) + 0.25/4)
    val eps = 1e-12
    assert(math.abs(pr1(1L) - 0.303125) < eps, s"pr1(1)=${pr1(1L)}")
    assert(math.abs(pr1(2L) - 0.196875) < eps, s"pr1(2)=${pr1(2L)}")
    assert(math.abs(pr1(3L) - 0.303125) < eps, s"pr1(3)=${pr1(3L)}")
    assert(math.abs(pr1(4L) - 0.196875) < eps, s"pr1(4)=${pr1(4L)}")
  }

  test("triangleCounts: hand census, direction/duplicate-insensitive, brute-force fuzz") {
    val s = spark
    import s.implicits._
    // K4 on {1,2,3,4} (4 triangles, each vertex in 3) plus pendant 5-1
    // and isolated vertex 6; edges deliberately duplicated and mixed
    // direction — the canonicalization must absorb both
    val k4 = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 4L), (2L, 3L),
      (3L, 2L), (2L, 4L), (3L, 4L), (5L, 1L))
    val tri = GraphOps.triangleCounts(k4.toDF("src", "dst"),
      Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(tri(1L) === ((4L, 3L, 0.5)))   // deg 4: 3 of C(4,2)=6 pairs closed
    assert(tri(2L) === ((3L, 3L, 1.0)))
    assert(tri(3L) === ((3L, 3L, 1.0)))
    assert(tri(4L) === ((3L, 3L, 1.0)))
    assert(tri(5L) === ((1L, 0L, 0.0)))
    assert(tri(6L) === ((0L, 0L, 0.0)))
    // fuzz: random graphs vs an in-memory brute-force count
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 3) {
      val n = 12
      val es = (for {
        a <- 0L until n; b <- (a + 1) until n
        if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      val und = es.toSet
      def adj(v: Long) = und.collect {
        case (`v`, w) => w
        case (w, `v`) => w
      }
      val expect = (0L until n).map { v =>
        val nb = adj(v).toSeq
        val t = (for {
          i <- nb.indices; j <- (i + 1) until nb.size
          x = math.min(nb(i), nb(j)); y = math.max(nb(i), nb(j))
          if und.contains((x, y))
        } yield 1).size.toLong
        v -> t
      }.toMap
      val got = GraphOps.triangleCounts(es.toDF("src", "dst"),
        (0L until n).toDF("id"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got === expect, s"trial $trial: $got vs $expect")
    }
  }

  test("pageRank conserves total mass across iterations") {
    val s = spark
    import s.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 1L))
      .toDF("src", "dst")
    val verts = (1L to 6L).toDF("id") // 6 has no edges at all
    val total = GraphOps.pageRank(edges, verts, iterations = 3)
      .agg(sum(col("pr"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9,
      s"rank mass not conserved: $total")
  }

  test("label propagation: reach grows per iteration, seeds clamp, ties to smallest") {
    val s = spark
    import s.implicits._
    // chain 2→1, 3→2 (labels reach 3 only at iter2); 10 votes on {A=5,B=7}
    // neighbors with one vote each (tie → smaller label); seed 20 has a
    // differently-labeled neighbor but must keep its own label
    val edges = Seq((2L, 1L), (3L, 2L), (10L, 5L), (10L, 7L), (20L, 1L))
      .toDF("src", "dst")
    val seeds = Seq((1L, 3), (5L, 8), (7L, 9), (20L, 6)).toDF("id", "label")
    val verts = (Seq(1L, 2L, 3L, 5L, 7L, 10L, 20L, 99L)).toDF("id")
    val out = GraphOps.labelPropagate(edges, seeds, verts, iterations = 2)
      .collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.getString(2))))).toMap
    assert(out(1L) === ((Some(3L), Some("seed"))))
    assert(out(2L) === ((Some(3L), Some("iter1"))))
    assert(out(3L) === ((Some(3L), Some("iter2")))) // two hops from the seed
    assert(out(10L) === ((Some(8L), Some("iter1")))) // tie 8 vs 9 → smaller
    assert(out(20L) === ((Some(6L), Some("seed")))) // clamped, not overwritten
    assert(out(99L) === ((None, None))) // disconnected: honestly unlabeled
  }

  test("editDistancePairs: length-banded blocking is exact vs brute force") {
    val s = spark
    import s.implicits._
    // lengths 2..6 — includes same-length pairs, off-by-one/two lengths,
    // and a length gap of 3+ the band must (correctly) skip
    val vals = Seq("ab", "abc", "abd", "abcd", "abcde", "abcdef", "xy",
      "xyz", "wxyz").toDF("name")
    val banded = Fuzzy.editDistancePairs(vals, "name", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val v2 = vals.select(col("name").as("b"))
    val brute = vals.select(col("name").as("a")).crossJoin(v2)
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b")).cast("long"))
      .filter(col("dist") <= 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(banded === brute,
      s"banded=${banded.size} brute=${brute.size}\n" +
        s"missing=${brute -- banded}\nextra=${banded -- brute}")
  }

  test("editDistancePairs plan: candidates via equi-join, never cartesian") {
    val p = Fuzzy.editDistancePairs(
        spark.read.parquet(s"$sf0001/supplier.parquet"), "s_name", 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"fuzzy pair generator is all-pairs:\n$p")
  }

  test("bm25 matches the Okapi formula on a hand-built corpus") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b a"), (2L, "a c"), (3L, "d d d d"))
      .toDF("doc_id", "text")
    val got = TextOps.bm25(d, Seq("a", "c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=3, avgdl=3, df(a)=2, df(c)=1
    val idfA = math.log(1.0 + (3.0 - 2.0 + 0.5) / 2.5)
    val idfC = math.log(1.0 + (3.0 - 1.0 + 0.5) / 1.5)
    def term(idf: Double, tf: Double, dl: Double): Double =
      idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 3.0))
    val exp1 = term(idfA, 2.0, 3.0)
    val exp2 = term(idfA, 1.0, 2.0) + term(idfC, 1.0, 2.0)
    assert(math.abs(got(1L) - exp1) < 1e-6, s"doc1 ${got(1L)} vs $exp1")
    assert(math.abs(got(2L) - exp2) < 1e-6, s"doc2 ${got(2L)} vs $exp2")
    assert(!got.contains(3L), "doc with no query terms must not score")
  }

  test("bm25 plan: query-term filter applies before the tf aggregation") {
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
    val p = TextOps.bm25(d, Seq("spark", "vector", "window"))
      .queryExecution.optimizedPlan.toString
    // the isin() must sit UNDER the (doc_id, term) aggregate so only
    // query-term postings shuffle, not the whole vocabulary
    val aggIdx = p.indexOf("Aggregate [doc_id")
    val filtIdx = p.lastIndexOf("vector")
    assert(aggIdx >= 0 && filtIdx > aggIdx,
      s"query-term filter not below tf aggregate:\n$p")
  }
}
