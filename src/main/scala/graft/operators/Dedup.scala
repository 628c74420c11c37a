package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each chosen for its
  * 100 TB scale path:
  *
  *  - exact: hash-groupBy on a content fingerprint — one shuffle keyed by a
  *    16-byte digest, the cheapest possible full dedup.
  *  - n-gram Jaccard: inverted-index join on shared shingles (never a cross
  *    join); candidate pairs are bounded by shingle co-occurrence.
  *  - MinHash + LSH: constant-size signatures per doc, banded bucketing, and
  *    a bucket-equality join — the standard sub-quadratic near-dup pipeline.
  *  - SimHash: one 16-bit signature per doc; near-dups share (or almost
  *    share) signatures, so candidate generation is a signature groupBy.
  *
  * Hash functions are engine-portable (md5 hex, string MIN) so every stage
  * can be oracle-checked against DuckDB.
  */
object Dedup {

  /** Exact dedup: canonical id + group size per identical text. */
  def exact(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    docs.select(
      col("doc_id"),
      min(col("doc_id")).over(w).as("canonical_id"),
      count(lit(1)).over(w).as("group_size"))
  }

  /** Distinct word n-gram shingles per doc: (doc_id, shingle).
    * Built with lead() windows over exploded tokens — linear, partitioned
    * by doc.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val tok = docs.select(col("doc_id"),
      posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "w")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val parts = (0 until n).map(i =>
      if (i == 0) col("w") else lead(col("w"), i).over(w))
    tok.select(col("doc_id"), concat_ws(" ", parts: _*).as("shingle"),
        lead(col("w"), n - 1).over(w).isNotNull.as("complete"))
      .filter(col("complete"))
      .select(col("doc_id"), col("shingle"))
      .distinct()
  }

  /** Candidate near-dup pairs by n-gram Jaccard similarity, via an
    * inverted-index self-join on shingles (shared-shingle pairs only).
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = shingles(docs, n).cache()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
    val pairs = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("doc_id").as("a"), col("n_shingles").as("na")), "a")
      .join(sizes.select(col("doc_id").as("b"), col("n_shingles").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
  }

  /** MinHash signatures: numHashes portable hash functions h_i(shingle) =
    * md5(i || ':' || shingle); the signature component is the string MIN.
    */
  def minhashSignatures(docs: DataFrame, numHashes: Int = 16): DataFrame = {
    val sh = shingles(docs)
    sh.crossJoin(broadcast(
        docs.sparkSession.range(0, numHashes).select(col("id").as("h"))))
      .groupBy(col("doc_id"), col("h"))
      .agg(min(md5(concat(col("h").cast("string"), lit(":"), col("shingle")))).as("mh"))
  }

  /** LSH candidate pairs: band signatures (h mod bands), bucket by the
    * md5 of the band's concatenated minhashes, join docs sharing a bucket,
    * then estimate Jaccard as the fraction of matching signature components.
    */
  def minhashLshPairs(docs: DataFrame, numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val sig = minhashSignatures(docs, numHashes).cache()
    val buckets = sig.withColumn("band", col("h") % bands)
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("h"), col("mh")))),
        s => s.getField("mh")), ",")).as("bucket"))
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .distinct()
    cand.join(sig.select(col("doc_id").as("a"), col("h"), col("mh").as("mha")), Seq("a"))
      .join(sig.select(col("doc_id").as("b"), col("h"), col("mh").as("mhb")),
        Seq("b", "h"))
      .groupBy(col("a"), col("b"))
      .agg((count(when(col("mha") === col("mhb"), 1)).cast("double") /
        lit(numHashes.toDouble)).as("est_jaccard"))
  }

  /** SimHash: per-bit +1/-1 votes from each distinct token's md5, sign of
    * the per-bit sum forms the signature (here as a bit string, portable
    * across engines).
    */
  def simhash(docs: DataFrame, bits: Int = 16): DataFrame = {
    val tok = docs.select(col("doc_id"),
      explode(array_distinct(TextOps.tokens(col("text")))).as("w"))
    val votes = tok.crossJoin(broadcast(
        docs.sparkSession.range(0, bits).select(col("id").as("b"))))
      .withColumn("v",
        when(ascii(expr("substring(md5(w), cast(b + 1 as int), 1)")) % 2 === 1, 1L)
          .otherwise(-1L))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(col("v")).as("sv"))
    votes.groupBy(col("doc_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("b"), col("sv")))),
        s => when(s.getField("sv") >= 0, "1").otherwise("0")), "").as("simhash"))
  }
}
