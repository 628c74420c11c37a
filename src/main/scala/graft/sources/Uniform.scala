package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession

/** UniForm — publish a Delta table's CURRENT snapshot as Iceberg metadata
  * over the SAME parquet files (Delta Lake's "Universal Format": one copy
  * of the data, two protocol views of it; the public Delta UniForm feature
  * generates Iceberg metadata asynchronously after each Delta commit —
  * this is that generator as an explicit sync call).
  *
  * Why it matters at 100 TB: a corpus landed as Delta becomes readable by
  * every Iceberg-side consumer (query engines, catalogs, the incremental
  * scan, snapshot tags) for the cost of ONE metadata commit per sync —
  * zero data copied, zero files moved. The Iceberg `metadata/` tree lives
  * inside the Delta table root, so the directory is simultaneously a valid
  * Delta table (source of truth) and a valid Iceberg table (derived view).
  *
  * Sync contract:
  *  - Delta is the source of truth; the Iceberg view is derived and
  *    read-only. A v2 delete file in the mirror metadata means something
  *    wrote through the Iceberg side — the sync refuses rather than
  *    silently reconciling two divergent write histories.
  *  - Each sync commits one Iceberg snapshot stamped with the Delta
  *    version it mirrors (`delta-version` summary key). Re-syncing an
  *    already-mirrored version is a no-op (returns None) — the idempotence
  *    key is the version, exactly like the streaming sinks' epoch.
  *  - Files still live since the last sync carry forward as EXISTING
  *    entries (manifest identity, bounds, and sequence numbers preserved);
  *    new files enter as ADDED with footer row counts, and `statsFields`
  *    ((Iceberg field id, column)) folds footer MIN/MAX into manifest
  *    bounds so [[IcebergLog.pruneByLongBounds]] prunes the mirror.
  *  - The snapshot's `operation` summary is honest: `append` when the
  *    prior live set survived intact, `overwrite` when any file
  *    disappeared (a Delta delete/merge/optimize) — so
  *    [[IcebergLog.appendsBetween]] serves append-only ranges
  *    incrementally and REFUSES ranges crossing a row-changing sync,
  *    never misreporting changes.
  *
  * Refused inputs (each would produce an Iceberg view that reads
  * differently from the Delta truth):
  *  - live deletion vectors (Iceberg readers would resurrect the deleted
  *    rows — purge first, [[DeltaWrite.purgeDeletionVectors]]);
  *  - column-mapped tables (physical parquet names diverge from logical
  *    names; Iceberg-side readers would see physical names);
  *  - partitioned tables (Delta keeps partition column DATA in the log,
  *    not the files — Iceberg files must be self-describing, so the
  *    mirrored scan would lose those columns entirely).
  *
  * Real UniForm has the same constraints family (DVs require Iceberg v3,
  * mapping/partitioning need metadata translation this mirror does not
  * attempt — refusal beats silent divergence).
  */
object Uniform {

  /** Outcome of one sync: `snapshotId` is None when the Delta version was
    * already mirrored (no-op).
    */
  final case class SyncStats(snapshotId: Option[Long], deltaVersion: Long,
      filesAdded: Int, filesCarried: Int)

  /** The Delta version the mirror's head snapshot records, if any. */
  def mirroredVersion(tablePath: String): Option[Long] = {
    val metaDir = new File(tablePath, "metadata")
    val hasMeta = Option(metaDir.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.matches("v\\d+\\.metadata\\.json"))
    if (!hasMeta) None
    else IcebergLog.snapshots(tablePath).lastOption
      .flatMap(_.summary.get("delta-version")).map(_.toLong)
  }

  /** Sync the Iceberg view to the Delta table's current snapshot. */
  def deltaToIceberg(spark: SparkSession, tablePath: String,
      statsFields: Seq[(Int, String)] = Seq.empty): SyncStats = {
    val deltaVersion = DeltaLog.latestVersion(tablePath)
    if (mirroredVersion(tablePath).contains(deltaVersion))
      return SyncStats(None, deltaVersion, 0, 0)
    require(DeltaLog.mappingMode(
        DeltaLog.tableMetaData(spark, tablePath)) == "none",
      s"column-mapped Delta table cannot mirror to Iceberg: $tablePath — " +
        "physical parquet names diverge from logical names")
    val adds = DeltaLog.liveAdds(spark, tablePath)
    require(adds.nonEmpty, s"Delta table has no live files: $tablePath")
    require(adds.forall(_.dv.isEmpty),
      s"live deletion vectors in $tablePath — an Iceberg reader would " +
        "resurrect the deleted rows; purge first (REORG ... APPLY (PURGE))")
    require(adds.forall(_.partitionValues.isEmpty),
      s"partitioned Delta table cannot mirror to Iceberg: $tablePath — " +
        "partition column data lives in the Delta log, not the parquet " +
        "files, so the mirrored files are not self-describing")

    val metaDir = new File(tablePath, "metadata")
    metaDir.mkdirs()
    val hasMeta = Option(metaDir.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.matches("v\\d+\\.metadata\\.json"))
    val (priorData, priorDeletes) =
      if (!hasMeta) (Seq.empty[IcebergLog.LiveEntry], Seq.empty[IcebergLog.LiveEntry])
      else IcebergLog.liveSplitEntries(tablePath)
    require(priorDeletes.isEmpty,
      s"Iceberg-side delete files present in $tablePath — the mirror is " +
        "derived, read-only state; a write through the Iceberg view has " +
        "diverged it from the Delta truth")

    val deltaPaths = adds.map(a => new File(a.path).getAbsolutePath).toSet
    val carried = priorData.filter(e =>
      deltaPaths.contains(new File(e.path).getAbsolutePath))
    val carriedPaths = carried.map(e => new File(e.path).getAbsolutePath).toSet
    val fresh = adds.filterNot(a =>
      carriedPaths.contains(new File(a.path).getAbsolutePath))
    // honest operation summary: rows only ever arrived → append; any
    // prior file gone → the sync may have removed rows → overwrite (the
    // incremental scan refuses to cross it rather than misreport)
    val op =
      if (priorData.size == carried.size) "append" else "overwrite"
    val sid = IcebergLog.commitSnapshot(tablePath,
      carried.map(IcebergLog.existingEntry) ++
        fresh.map(a => IcebergLog.addedEntry(new File(a.path), statsFields)),
      summary = Map("delta-version" -> deltaVersion.toString),
      operation = op)
    SyncStats(Some(sid), deltaVersion, fresh.size, carried.size)
  }
}
