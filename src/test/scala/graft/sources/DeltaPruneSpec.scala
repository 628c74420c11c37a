package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit pins for [[DeltaWrite.prunePartitionConjuncts]] — the log-only
  * match-scan pruning the partitioned DELETE path rides. Lives in
  * `graft.sources` to reach the package-private seam directly: each case
  * asserts the KEPT FILE SET, which is the strongest possible statement
  * (a recordsRead bound would blur the identity scan and rewrite reads
  * together). Soundness cases mirror the scaladoc's argument:
  *
  *  - a top-level AND conjunct referencing ONLY partition columns is
  *    constant per file, so a false-or-null tuple proves no row matches;
  *  - conjuncts touching any data column, OR-roots, and non-deterministic
  *    conjuncts must prune NOTHING (they vary within a file);
  *  - the null tuple prunes under equality (never equal) but survives
  *    isNull — SQL three-valued logic at the file level.
  */
class DeltaPruneSpec extends SparkSpec {

  private lazy val tmp =
    Files.createTempDirectory("graft-prune").toFile.getAbsolutePath

  // the null partition records "cat" -> null; flatten to None so the
  // expectations read as plain Options
  private def pvOf(a: DeltaLog.LiveFile): Option[String] =
    a.partitionValues.get("cat").flatMap(Option(_))

  test("partition-only conjuncts prune from the log; data conjuncts never do") {
    val s = spark
    import s.implicits._
    val tbl = s"$tmp/prune_basic"
    DeltaWrite.appendPartitioned(
      Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")),
        (4L, Option.empty[String])).toDF("id", "cat"),
      tbl, Seq("cat"))
    val adds = DeltaLog.liveAdds(spark, tbl)
    assert(adds.size === 4)
    def kept(pred: org.apache.spark.sql.Column): Set[Option[String]] =
      DeltaWrite.prunePartitionConjuncts(spark, tbl, adds, pred)
        .map(pvOf).toSet

    // pure partition equality: one file survives (null tuple pruned too —
    // an equality is never true of null)
    assert(kept(col("cat") === "b") === Set(Some("b")))
    // partition conjunct AND data conjunct: the partition half prunes,
    // the data half is left to the row filter
    assert(kept(col("cat") === "a" && col("id") % 2 === 0) ===
      Set(Some("a")))
    // IN-list over the partition column
    assert(kept(col("cat").isin("a", "c") && col("id") > 0) ===
      Set(Some("a"), Some("c")))
    // isNull keeps exactly the null partition
    assert(kept(col("cat").isNull) === Set(None))
    // data-only predicate: prunes nothing
    assert(kept(col("id") === 3L).size === 4)
    // OR at the root mixes partition and data columns in ONE conjunct —
    // it references a data column, so it must prune nothing
    assert(kept(col("cat") === "a" || col("id") === 3L).size === 4)
    // non-deterministic conjuncts are never evaluated against tuples
    assert(kept(col("cat") === "a" && rand() > -1).size >= 1)
    assert(kept(rand() > 2).size === 4)
  }

  test("unpartitioned tables and empty conjunct sets pass through") {
    val s = spark
    import s.implicits._
    val tbl = s"$tmp/prune_flat"
    DeltaWrite.append(Seq((1L, "a"), (2L, "b")).toDF("id", "cat"), tbl)
    val adds = DeltaLog.liveAdds(spark, tbl)
    assert(DeltaWrite.prunePartitionConjuncts(spark, tbl, adds,
      col("cat") === "a").size === adds.size)
  }

  test("mapped partitioned tables prune by LOGICAL name against physical pv keys") {
    val s = spark
    import s.implicits._
    val tbl = s"$tmp/prune_mapped"
    DeltaWrite.createIdMapped(
      Seq((1L, "x"), (2L, "y")).toDF("id", "cat"), tbl,
      partitionCols = Seq("cat"))
    // the rename moves the LOGICAL name; pv keys (physical) are stable
    DeltaWrite.renameColumn(spark, tbl, "cat", "category")
    val adds = DeltaLog.liveAdds(spark, tbl)
    assert(adds.size === 2)
    val kept = DeltaWrite.prunePartitionConjuncts(spark, tbl, adds,
      col("category") === "y" && col("id") > 0)
    assert(kept.size === 1)
    assert(kept.head.partitionValues.values.toSeq === Seq("y"))
  }

  test("typed partition values prune with their declared comparison semantics") {
    val s = spark
    import s.implicits._
    val tbl = s"$tmp/prune_typed"
    DeltaWrite.appendPartitioned(
      Seq((1L, 5L), (2L, 10L), (3L, 50L)).toDF("id", "bucket"),
      tbl, Seq("bucket"))
    val adds = DeltaLog.liveAdds(spark, tbl)
    // numeric comparison, not string: "5" < "10" lexicographically would
    // invert this range
    val kept = DeltaWrite.prunePartitionConjuncts(spark, tbl, adds,
      col("bucket") >= 10L && col("id") > 0)
    assert(kept.flatMap(_.partitionValues.get("bucket")).toSet ===
      Set("10", "50"))
    // the READER also serves the declared type (the log stores strings;
    // a string 'bucket' here would throw on getLong)
    val got = DeltaLog.read(spark, tbl).select("id", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 5L), (2L, 10L), (3L, 50L)))
    // partitioned adds carry footer stats like flat ones (r18): the
    // metadata-only count and data skipping work on partitioned tables
    assert(adds.forall(_.statsJson.nonEmpty),
      "partitioned adds lost their footer stats")
    assert(DeltaLog.countFromStats(spark, tbl) === Some(3L))
  }
}
