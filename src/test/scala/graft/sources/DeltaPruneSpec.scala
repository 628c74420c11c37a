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

  test("CONVERT-adopted colliding basenames: CoW verbs resolve by full path") {
    val s = spark
    import s.implicits._
    // one task writing every partition dir gives IDENTICAL basenames
    // (part-00000-<jobUUID>) across dirs — the adopted-table shape a
    // basename-keyed touched-file map silently corrupts
    val tbl = s"$tmp/collide"
    Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "a", 30L), (4L, "b", 40L))
      .toDF("id", "cat", "v").repartition(1)
      .write.partitionBy("cat").parquet(tbl)
    def basenames(f: java.io.File): Seq[String] =
      Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap {
        case d if d.isDirectory => basenames(d)
        case p if p.getName.endsWith(".parquet") => Seq(p.getName)
        case _ => Seq.empty
      }
    val names = basenames(new java.io.File(tbl))
    assert(names.distinct.size < names.size,
      s"fixture did not collide: $names")
    DeltaWrite.convertParquet(spark, tbl, Seq("cat"))
    // delete a row in cat=b: under basename keying the touched lookup
    // could resolve cat=a's file — wrong file removed, dead row alive
    val ds = DeltaWrite.deleteWhere(spark, tbl, col("id") === 2L)
    assert(ds.rowsDeleted === 1L)
    assert(DeltaLog.read(spark, tbl).select("id", "cat", "v").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet ===
      Set((1L, "a", 10L), (3L, "a", 30L), (4L, "b", 40L)))
    val ms = DeltaWrite.merge(tbl,
      Seq((3L, "a", 31L), (9L, "b", 90L)).toDF("id", "cat", "v"),
      Seq("id"))
    assert(ms.rowsUpdated === 1L && ms.rowsInserted === 1L)
    assert(DeltaLog.read(spark, tbl).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 10L, 3L -> 31L, 4L -> 40L, 9L -> 90L))
  }

  test("schema evolution on a partitioned table: declared decode, no footer race") {
    val s = spark
    import s.implicits._
    // two partitions; the evolving merge touches only 'a', so 'b' stays
    // physically OLD — a footer-inference read would let whichever file
    // won decide if the evolved column exists at all
    val tbl = s"$tmp/evolve_part"
    DeltaWrite.appendPartitioned(
      Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("id", "cat", "v"),
      tbl, Seq("cat"))
    val st = DeltaWrite.merge(tbl,
      Seq((1L, "a", 11L, "x")).toDF("id", "cat", "v", "note"),
      Seq("id"), mergeSchema = true)
    assert(st.rowsUpdated === 1L)
    val got = DeltaLog.read(spark, tbl)
      .select("id", "cat", "v", "note").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.getString(3)))).toSet
    assert(got === Set((1L, "a", 11L, Some("x")),
      (2L, "b", 20L, None)),
      "evolved column did not NULL-fill the untouched partition")
    // pre-evolution travel reads the old schema
    assert(!DeltaLog.read(spark, tbl, Some(0L)).columns.contains("note"))
    // the match scans decode through the evolved schema too: a second
    // merge keyed into the untouched partition must see `note` as null
    val st2 = DeltaWrite.merge(tbl,
      Seq((2L, "b", 21L, "y")).toDF("id", "cat", "v", "note"), Seq("id"))
    assert(st2.rowsUpdated === 1L)
    assert(DeltaLog.read(spark, tbl).select("id", "note").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap ===
      Map(1L -> Some("x"), 2L -> Some("y")))
  }

  test("merge partition-key pruning compares typed, not string renderings") {
    val s = spark
    import s.implicits._
    // a foreign hive layout records bucket=05; the reader casts it to
    // int 5 — pruning the match scan by the batch's STRING rendering
    // ("5" vs "05") would drop the file and turn an update into a
    // duplicate-key insert
    val tbl = s"$tmp/foreign_pv"
    Seq((1L, 10L)).toDF("id", "v")
      .write.parquet(s"$tbl/bucket=05")
    Seq((2L, 20L)).toDF("id", "v")
      .write.parquet(s"$tbl/bucket=10")
    DeltaWrite.convertParquet(spark, tbl, Seq("bucket"))
    val adds = DeltaLog.liveAdds(spark, tbl)
    assert(adds.flatMap(_.partitionValues.values).toSet === Set("05", "10"))
    val ms = DeltaWrite.merge(tbl,
      Seq((5, 1L, 11L)).toDF("bucket", "id", "v"),
      Seq("bucket", "id"))
    assert(ms.rowsUpdated === 1L && ms.rowsInserted === 0L,
      s"typed pruning lost the 05 partition: $ms")
    assert(DeltaLog.read(spark, tbl).select("id", "v").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(1L -> 11L, 2L -> 20L))
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
