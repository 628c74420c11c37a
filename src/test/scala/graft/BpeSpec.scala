package graft

import org.apache.spark.sql.functions._

import graft.functions.{BpeOps, BpeTable, NativeFunctions}
import graft.operators.TextOps

/** Merges-file BPE tokenizer: file validity, known tokenizations, the
  * batch-greedy ↔ stepwise equivalence the DuckDB oracle's recursive-CTE
  * replay depends on, and the native expressions end to end.
  */
class BpeSpec extends SparkSpec {

  test("default merges file parses and is BPE-valid") {
    val merges = BpeOps.defaultMerges
    assert(merges.length === 58)
    assert(merges.head === (("t", "h")))
    // validity: every multi-character constituent of merge i must be the
    // product of an earlier merge — the property all LEARNED merges files
    // have by construction, and the precondition for the stepwise form
    // (the oracle's recursive CTE) to equal the batch-greedy form
    val produced = scala.collection.mutable.Map.empty[String, Int]
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      for (c <- Seq(l, r) if c.length > 1)
        assert(produced.get(c).exists(_ < i),
          s"constituent '$c' of rank-$i merge not produced earlier")
      produced.getOrElseUpdate(l + r, i)
    }
  }

  test("parseMerges skips headers/blanks and rejects malformed lines") {
    val m = BpeOps.parseMerges("#version: x\n\na b\nab c\n")
    assert(m.toSeq === Seq(("a", "b"), ("ab", "c")))
    intercept[IllegalArgumentException](BpeOps.parseMerges("one\n"))
    intercept[IllegalArgumentException](BpeOps.parseMerges("a b c\n"))
  }

  test("known tokenizations over the corpus vocabulary") {
    val t = new BpeTable(BpeOps.defaultMerges)
    assert(t.tokenizeWord("the").toSeq === Seq("the"))
    assert(t.tokenizeWord("customer").toSeq === Seq("customer"))
    assert(t.tokenizeWord("batch").toSeq === Seq("batch"))
    assert(t.tokenizeWord("data").toSeq === Seq("data"))
    assert(t.tokenizeWord("stream").toSeq === Seq("st", "r", "e", "a", "m"))
    assert(t.tokenizeWord("window").toSeq === Seq("w", "in", "d", "ow"))
    assert(t.tokenizeWord("order").toSeq === Seq("or", "d", "er"))
    assert(t.tokenizeWord("agg").toSeq === Seq("a", "gg"))
    assert(t.tokenizeWord("value").toSeq === Seq("v", "al", "ue"))
    assert(t.tokenizeWord("x").toSeq === Seq("x"))
    assert(t.tokenizeWord("").toSeq === Seq.empty)
  }

  test("rank order beats position order (lowest-rank pair merges first)") {
    // in "window", (o,w) rank 4 fires before the earlier-positioned (i,n)
    // rank 6 — pin that the loop is rank-greedy, not left-greedy
    val t = new BpeTable(Array(("x", "y"), ("a", "b")))
    // word "abxy": (a,b) rank 1 vs (x,y) rank 0 -> xy merges first
    assert(t.tokenizeWordGreedy("abxy").toSeq === Seq("ab", "xy"))
    val t2 = new BpeTable(Array(("a", "b"), ("ab", "xy"), ("x", "y")))
    // (x,y) rank 2 merges only after (a,b) rank 0; then (ab,xy) completes
    assert(t2.tokenizeWordGreedy("abxy").toSeq === Seq("abxy"))
  }

  test("overlapping occurrences merge left-to-right non-overlapping") {
    val t = new BpeTable(Array(("a", "a")))
    assert(t.tokenizeWordGreedy("aaa").toSeq === Seq("aa", "a"))
    assert(t.tokenizeWordGreedy("aaaa").toSeq === Seq("aa", "aa"))
    assert(t.tokenizeWordStepwise("aaa").toSeq === Seq("aa", "a"))
    assert(t.tokenizeWordStepwise("aaaa").toSeq === Seq("aa", "aa"))
  }

  test("batch-greedy equals stepwise over corpus vocabulary and fuzz") {
    val t = new BpeTable(BpeOps.defaultMerges)
    // the full test-corpus vocabulary — the equivalence the oracle replay
    // of t05/t11/pck01 rests on, checked on the words it actually sees
    val vocab = spark.read.parquet(s"$sf001/documents.parquet")
      .select(explode(split(trim(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0))
    assert(vocab.nonEmpty)
    vocab.foreach { w =>
      assert(t.tokenizeWordGreedy(w).toSeq === t.tokenizeWordStepwise(w).toSeq,
        s"batch != stepwise for corpus word '$w'")
    }
    // plus deterministic fuzz over the corpus alphabet
    val rng = new scala.util.Random(7)
    (1 to 5000).foreach { _ =>
      val w = (1 to (1 + rng.nextInt(12)))
        .map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      assert(t.tokenizeWordGreedy(w).toSeq === t.tokenizeWordStepwise(w).toSeq,
        s"batch != stepwise for fuzzed word '$w'")
    }
  }

  test("bpe_tokens / bpe_token_count expressions: end to end, count = size") {
    val s = spark
    import s.implicits._
    NativeFunctions.register(s)
    val d = Seq(
      (1L, "the customer batch"),
      (2L, "  stream   window  "),
      (3L, ""),
      (4L, "   ")).toDF("doc_id", "text")
    val out = d.select(col("doc_id"),
        TextOps.bpeTokens(col("text")).as("tk"),
        TextOps.bpeTokenCount(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1), r.getLong(2)))
      .sortBy(_._1)
    assert(out(0)._2 === Seq("the", "customer", "batch"))
    assert(out(1)._2 === Seq("st", "r", "e", "a", "m", "w", "in", "d", "ow"))
    assert(out(2)._2 === Seq.empty)
    assert(out(3)._2 === Seq.empty)
    assert(out.forall { case (_, tk, n) => tk.length.toLong == n })
    // null text -> null outputs
    val nulls = d.select(TextOps.bpeTokens(lit(null).cast("string")),
      TextOps.bpeTokenCount(lit(null).cast("string"))).head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
  }

  test("bpeTokenStats digests the exact token stream") {
    NativeFunctions.register(spark)
    val s = spark
    import s.implicits._
    val d = Seq((1L, "the the agg"), (2L, "")).toDF("doc_id", "text")
    val rows = TextOps.bpeTokenStats(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).sortBy(_._1)
    def md5hex(x: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // "the the agg" -> the the a gg : 4 tokens, 3 distinct
    assert(rows(0) === ((1L, 3L, 4L, 3L, md5hex("the the a gg"))))
    assert(rows(1) === ((2L, 0L, 0L, 0L, md5hex(""))))
  }

  test("interpreted eval matches codegen for bpe expressions") {
    NativeFunctions.register(spark)
    val s = spark
    import s.implicits._
    val d = Seq.tabulate(64)(i => (i.toLong, s"customer $i batch value"))
      .toDF("doc_id", "text")
    val withCodegen = d.select(col("doc_id"),
      md5(array_join(TextOps.bpeTokens(col("text")), " ")).as("dg"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // force the interpreted path
    val prev = s.conf.get("spark.sql.codegen.wholeStage", "true")
    s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = d.select(col("doc_id"),
        md5(array_join(TextOps.bpeTokens(col("text")), " ")).as("dg"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(interpreted === withCodegen)
    } finally {
      s.conf.set("spark.sql.codegen.wholeStage", prev)
      s.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("single evaluation: chunk() runs the BPE merge loop once per row") {
    // the t11 plan references the token array three times (window count,
    // slice, residual length); a silent per-reference re-evaluation is
    // invisible to the oracle and a 2-3x CPU tax at scale. The volatile-
    // gated eval counter pins the real evaluation count under the same
    // execution mode the query uses.
    val s = spark
    import s.implicits._
    val n = 50
    val d = Seq.tabulate(n)(i =>
      (i.toLong, s"customer $i batch value data stream window order"))
      .toDF("doc_id", "text")
    BpeOps.resetEvalCount()
    BpeOps.countEvals = true
    try {
      val out = TextOps.chunk(d, chunkTokens = 4, overlapTokens = 1,
        tokensOf = TextOps.bpeTokens(_)).collect()
      assert(out.length > n) // multiple chunks per doc: windows really cut
      val evals = BpeOps.evalCount
      assert(evals === n.toLong,
        s"bpe_tokens evaluated $evals times for $n rows (want exactly $n)")
    } finally BpeOps.countEvals = false
  }
}
