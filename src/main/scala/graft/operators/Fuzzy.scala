package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy string matching — the entity-resolution primitive (supplier /
  * customer / catalog reconciliation) the reference's scalar-function
  * surface stops short of. The pair generator is BLOCKED, not all-pairs:
  * candidates form through an equi-join, the expensive edit-distance only
  * runs inside blocks.
  */
object Fuzzy {

  /** All unordered pairs of distinct values of `keyCol` within edit
    * distance `maxDist`, via length-banded blocking: each value explodes
    * into the `2·maxDist+1` lengths it could match
    * (`len−maxDist … len+maxDist`), then candidates form by EQUI-join on
    * `(probe_len = candidate's real len)`. Levenshtein distance is lower
    * -bounded by the length difference, so the blocking is EXACT — no
    * admissible pair is lost — while the join is hash-partitioned by
    * length instead of a quadratic cross product, and the O(n·m)
    * `levenshtein` expression runs only inside the banded candidates.
    * The `a < b` canonical order halves the work and Spark's native
    * codegen'd `levenshtein` (with its `maxDist` early-exit overload)
    * scores each survivor once.
    *
    * At 100 TB the distinct-values step is the usual groupBy shrink (names
    * / titles dedupe heavily); for corpora whose value sets are themselves
    * huge, length alone under-blocks — compose with a coarser key (e.g.
    * first character) by pre-partitioning the input; the operator keeps
    * the length band exact within whatever partition it is handed.
    */
  def editDistancePairs(df: DataFrame, keyCol: String,
      maxDist: Int = 2): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val vals = df.select(col(keyCol).as("v")).filter(col("v").isNotNull)
      .distinct()
      .withColumn("len", length(col("v")))
    val probes = vals.select(col("v").as("a"),
      explode(sequence(col("len") - maxDist, col("len") + maxDist))
        .as("cand_len"))
    val cands = vals.select(col("v").as("b"), col("len").as("cand_len"))
    probes.join(cands, Seq("cand_len"))
      .filter(col("a") < col("b"))
      .withColumn("dist", levenshtein(col("a"), col("b"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("a"), col("b"), col("dist").cast("long").as("dist"))
  }
}
