package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the single LATEST right row whose
  * timestamp is at or before the left row's, per join key — the
  * time-series point-in-time lookup (pandas `merge_asof`, DuckDB
  * `ASOF JOIN`; the reference's engine exposes no such operator, this
  * extends the surface for event workloads).
  *
  * Spark has no native as-of join, and the naive encodings fall over at
  * scale: a range-join (`l.ts >= r.ts` + per-key max) plans as a
  * broadcast-nested-loop or cartesian filter — O(events²) per key — and a
  * correlated subquery re-scans the right side per left row. The scalable
  * form composes existing operators: tag both sides, UNION them, sort each
  * key's timeline once, and carry the last-seen right payload forward with
  * a `last(ignoreNulls)` running window. ONE hash exchange on the key, one
  * per-partition sort, linear scan — the shape that survives 100 TB (and
  * how stream processors implement temporal joins: the right side is a
  * versioned state table, the left probes the latest version at its
  * event time).
  *
  * Semantics (pinned by OperatorsSpec + the e09 DuckDB ASOF oracle):
  *   - inclusive: a right row at exactly `l.ts` matches (DuckDB `>=`);
  *   - unmatched left rows keep their columns with null right payload
  *     (LEFT OUTER as-of);
  *   - several right rows on one (key, ts): the winner is the greatest
  *     payload struct (deterministic, engine-replayable) — pre-aggregate
  *     the right side if another tie policy is wanted;
  *   - `toleranceMicros`: a match older than the tolerance is nulled out
  *     (the match itself is still the latest row — tolerance filters, it
  *     does not fall back to older rows), matching `merge_asof(tolerance)`.
  *
  * Output: every left column unchanged, plus each right non-key column as
  * `<rightPrefix><name>` (including the matched right `tsCol`).
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String = "ts", rightPrefix: String = "r_",
      toleranceMicros: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one join key")
    val leftOnly = left.columns.filterNot(keys.contains).toSeq
      .filterNot(_ == tsCol)
    val rightPayload = right.columns.filterNot(keys.contains).toSeq
      .filterNot(_ == tsCol)
    // the right payload travels as ONE struct column so the running window
    // needs a single last(ignoreNulls) whatever the payload width; ts is
    // its first field (tolerance + output both read it back)
    val rStruct = struct((tsCol +: rightPayload).map(col): _*)
    val rStructType = right.select(rStruct.as("__r")).schema("__r").dataType
    val leftTypes = left.schema.map(f => f.name -> f.dataType).toMap

    val taggedLeft = left.select(
      keys.map(col) ++ Seq(col(tsCol)) ++ leftOnly.map(col) ++
        Seq(lit(null).cast(rStructType).as("__r"), lit(1).as("__tag")): _*)
    val taggedRight = right.select(
      keys.map(col) ++ Seq(col(tsCol)) ++
        leftOnly.map(c => lit(null).cast(leftTypes(c)).as(c)) ++
        Seq(rStruct.as("__r"), lit(0).as("__tag")): _*)

    // right rows sort BEFORE left rows at equal ts (__tag 0 < 1) → the
    // inclusive match; equal-ts right duplicates order by the payload
    // struct, so last() deterministically keeps the greatest
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__tag").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = taggedLeft.union(taggedRight)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val gated = toleranceMicros match {
      case Some(tol) => matched.withColumn("__m",
        when(unix_micros(col(tsCol)) -
          unix_micros(col("__m").getField(tsCol)) <= tol, col("__m")))
      case None => matched
    }
    gated.select(left.columns.map(col).toSeq ++
      (tsCol +: rightPayload).map(c =>
        col("__m").getField(c).as(s"$rightPrefix$c")): _*)
  }
}
