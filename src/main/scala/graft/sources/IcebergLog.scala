package graft.sources

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.server.MiniJson

/** Minimal read-only Apache Iceberg table support — the second lakehouse
  * format next to [[DeltaLog]] (the reference ships Delta only; Iceberg
  * extends the same capability family). An Iceberg table is parquet data
  * files plus a `metadata/` tree: versioned `v*.metadata.json` files (the
  * root, naming snapshots), per-snapshot Avro MANIFEST LISTS, and Avro
  * MANIFESTS whose entries add or delete data files. Reading a snapshot
  * is: resolve the current metadata file (version-hint.text, else highest
  * version), pick the snapshot (current-snapshot-id, or `snapshotAsOf`
  * for time travel), read its manifest list, read each manifest, keep
  * data-file entries whose status is not DELETED, and scan the surviving
  * parquet.
  *
  * Scale posture: identical to Delta's — the metadata tree is kilobytes
  * read on the driver (every Iceberg reader pays this), while the data
  * files flow into a normal distributed parquet scan with pushdown and
  * split planning intact. Snapshot isolation comes free: the file list is
  * immutable per snapshot.
  *
  * Loud refusals (the [[DeltaLog]] deletion-vector posture): v2 DELETE
  * files (`data_file.content != 0` — position/equality deletes that must
  * be anti-joined into the scan) and format versions above 2 throw rather
  * than silently returning deleted rows.
  */
object IcebergLog {

  final case class Snapshot(snapshotId: Long, manifestList: String)

  /** Parsed metadata root: format version + snapshots + the current one. */
  final case class TableMeta(formatVersion: Long, currentSnapshotId: Long,
      snapshots: Seq[Snapshot])

  /** Resolve the table's current metadata JSON: `version-hint.text` names
    * the version if present (the Hadoop-catalog convention), else the
    * highest-numbered `v*.metadata.json` wins.
    */
  private[sources] def currentMetadataFile(tablePath: String): File = {
    val metaDir = new File(tablePath, "metadata")
    require(metaDir.isDirectory, s"not an Iceberg table (no metadata/): $tablePath")
    val hint = new File(metaDir, "version-hint.text")
    if (hint.isFile) {
      val v = new String(Files.readAllBytes(hint.toPath),
        StandardCharsets.UTF_8).trim
      val f = new File(metaDir, s"v$v.metadata.json")
      require(f.isFile, s"version-hint names $v but ${f.getName} is absent")
      f
    } else {
      val candidates = Option(metaDir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.matches("v\\d+\\.metadata\\.json"))
      require(candidates.nonEmpty, s"no v*.metadata.json under $metaDir")
      candidates.maxBy(_.getName.stripPrefix("v")
        .stripSuffix(".metadata.json").toLong)
    }
  }

  private[sources] def parseMeta(f: File): TableMeta = {
    val root = MiniJson.parseObject(
        new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8))
      .getOrElse(throw new IllegalArgumentException(
        s"unparseable Iceberg metadata: ${f.getPath}"))
    val fv = root.get("format-version") match {
      case Some(d: Double) => d.toLong
      case _ => throw new IllegalArgumentException(
        s"Iceberg metadata without format-version: ${f.getPath}")
    }
    require(fv <= 2L, s"unsupported Iceberg format-version $fv (max 2)")
    val current = root.get("current-snapshot-id") match {
      case Some(d: Double) => d.toLong
      case _ => throw new IllegalArgumentException(
        s"Iceberg metadata without current-snapshot-id: ${f.getPath}")
    }
    val snaps = root.get("snapshots") match {
      case Some(xs: Seq[_]) => xs.collect { case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        Snapshot(mm("snapshot-id").asInstanceOf[Double].toLong,
          mm("manifest-list").asInstanceOf[String])
      }
      case _ => Seq.empty
    }
    TableMeta(fv, current, snaps)
  }

  private def readAvro(f: File): Seq[GenericRecord] = {
    val reader = new DataFileReader[GenericRecord](f,
      new GenericDatumReader[GenericRecord]())
    try reader.iterator().asScala.toVector finally reader.close()
  }

  /** The live parquet data files of a snapshot (current, or `snapshotAsOf`
    * by snapshot id). Relative `file_path`s resolve against the table root.
    */
  def liveFiles(tablePath: String,
      snapshotAsOf: Option[Long] = None): Seq[String] = {
    val meta = parseMeta(currentMetadataFile(tablePath))
    val wantedId = snapshotAsOf.getOrElse(meta.currentSnapshotId)
    val snap = meta.snapshots.find(_.snapshotId == wantedId).getOrElse(
      throw new IllegalArgumentException(
        s"snapshot $wantedId not in table metadata (have " +
          s"${meta.snapshots.map(_.snapshotId).mkString(",")})"))
    def resolve(p: String): String =
      if (new File(p).isAbsolute) p else new File(tablePath, p).getPath
    val manifests = readAvro(new File(resolve(snap.manifestList)))
      .map(_.get("manifest_path").toString)
    manifests.flatMap { mp =>
      readAvro(new File(resolve(mp))).flatMap { entry =>
        val status = entry.get("status").asInstanceOf[Int]
        val df = entry.get("data_file").asInstanceOf[GenericRecord]
        val content = df.get("content").asInstanceOf[Int]
        val path = df.get("file_path").toString
        require(content == 0,
          s"Iceberg v2 delete file in manifest ($path, content=$content): " +
            "applying position/equality deletes is unsupported; scanning " +
            "raw would return deleted rows")
        // status: 0 EXISTING, 1 ADDED, 2 DELETED
        if (status == 2) None else Some(resolve(path))
      }
    }
  }

  /** Snapshot scan as a DataFrame (current snapshot, or time travel via
    * `snapshotAsOf`).
    */
  def read(spark: SparkSession, tablePath: String,
      snapshotAsOf: Option[Long] = None): DataFrame = {
    val files = liveFiles(tablePath, snapshotAsOf)
    require(files.nonEmpty, s"Iceberg snapshot has no data files: $tablePath")
    spark.read.parquet(files: _*)
  }

  /** DDL entry point (`CREATE EXTERNAL TABLE ... STORED AS ICEBERG`). */
  def register(spark: SparkSession, name: String, tablePath: String): DataFrame = {
    read(spark, tablePath).createOrReplaceTempView(name)
    spark.emptyDataFrame
  }

  // ---- fixture writers (test / demo side): the READER above never sees
  // these — it walks whatever metadata tree is on disk. Schemas are the
  // spec's required core fields. --------------------------------------

  private val manifestFileSchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_file","fields":[
      |{"name":"manifest_path","type":"string"},
      |{"name":"manifest_length","type":"long"},
      |{"name":"partition_spec_id","type":"int"},
      |{"name":"added_snapshot_id","type":"long"}]}""".stripMargin)

  private val manifestEntrySchema = new Schema.Parser().parse(
    """{"type":"record","name":"manifest_entry","fields":[
      |{"name":"status","type":"int"},
      |{"name":"snapshot_id","type":["null","long"],"default":null},
      |{"name":"data_file","type":{"type":"record","name":"data_file_r","fields":[
      |{"name":"content","type":"int"},
      |{"name":"file_path","type":"string"},
      |{"name":"file_format","type":"string"},
      |{"name":"record_count","type":"long"},
      |{"name":"file_size_in_bytes","type":"long"}]}}]}""".stripMargin)

  private def writeAvro(f: File, schema: Schema,
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    try rows.foreach(w.append) finally w.close()
  }

  /** One manifest-entry fixture row. `content` 0 = data, 1/2 = v2 deletes
    * (for refusal tests); `status` 2 = DELETED.
    */
  final case class FixtureEntry(status: Int, filePath: String,
      recordCount: Long, content: Int = 0)

  /** Write one snapshot's manifest + manifest list into `metaDir`; returns
    * the metadata.json snapshot entry.
    */
  private def writeSnapshot(metaDir: File, sid: Long,
      entries: Seq[FixtureEntry]): String = {
    val manifest = new File(metaDir, s"m-$sid.avro")
    writeAvro(manifest, manifestEntrySchema, entries.map { e =>
      val df = new GenericData.Record(
        manifestEntrySchema.getField("data_file").schema())
      df.put("content", e.content)
      df.put("file_path", e.filePath)
      df.put("file_format", "PARQUET")
      df.put("record_count", e.recordCount)
      df.put("file_size_in_bytes", 0L)
      val r = new GenericData.Record(manifestEntrySchema)
      r.put("status", e.status)
      r.put("snapshot_id", sid)
      r.put("data_file", df)
      r
    })
    val list = new File(metaDir, s"snap-$sid.avro")
    val mf = new GenericData.Record(manifestFileSchema)
    mf.put("manifest_path", s"metadata/m-$sid.avro")
    mf.put("manifest_length", manifest.length())
    mf.put("partition_spec_id", 0)
    mf.put("added_snapshot_id", sid)
    writeAvro(list, manifestFileSchema, Seq(mf))
    s"""{"snapshot-id":$sid,"manifest-list":"metadata/snap-$sid.avro"}"""
  }

  private def writeMetadataVersion(metaDir: File, tablePath: String,
      version: Long, currentSid: Long, snapJsons: Seq[String]): Unit = {
    val target = new File(metaDir, s"v$version.metadata.json")
    val body =
      s"""{"format-version":2,"table-uuid":"graft-table",
         |"location":"$tablePath","current-snapshot-id":$currentSid,
         |"snapshots":[${snapJsons.mkString(",")}]}""".stripMargin
    // optimistic concurrency on the metadata version: CREATE_NEW is an
    // atomic O_EXCL claim — a concurrent committer of the same version
    // loses loudly (the Hadoop-catalog commit rule)
    try Files.write(target.toPath,
      body.getBytes(StandardCharsets.UTF_8),
      java.nio.file.StandardOpenOption.CREATE_NEW)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new IllegalStateException(
          s"concurrent Iceberg commit: metadata version $version already " +
            s"exists in $metaDir — retry at the next version")
    }
    Files.writeString(new File(metaDir, "version-hint.text").toPath,
      version.toString)
    ()
  }

  /** Write a manifest + its manifest-list + a metadata.json snapshot chain.
    * `snapshots` maps snapshot-id → entries; the LAST becomes current.
    * Returns the table path.
    */
  def writeFixture(tablePath: String,
      snapshots: Seq[(Long, Seq[FixtureEntry])]): String = {
    val metaDir = new File(tablePath, "metadata")
    metaDir.mkdirs()
    val snapJsons = snapshots.map { case (sid, entries) =>
      writeSnapshot(metaDir, sid, entries)
    }
    new File(metaDir, s"v${snapshots.size}.metadata.json").delete()
    writeMetadataVersion(metaDir, tablePath, snapshots.size.toLong,
      snapshots.last._1, snapJsons)
    tablePath
  }

  /** APPEND `df` as a new Iceberg snapshot: new data files under `data/`,
    * one manifest carrying the prior live files as EXISTING plus the new
    * ones as ADDED, a new manifest list, and the next metadata version
    * (prior snapshots preserved, so the table's own history time-travels).
    * Returns the committed snapshot id. Same durability order as
    * [[DeltaWrite]]: data files first, metadata last, version claimed
    * atomically.
    */
  def append(df: DataFrame, tablePath: String): Long = {
    val root = new File(tablePath)
    val metaDir = new File(root, "metadata")
    val dataDir = new File(root, "data")
    metaDir.mkdirs()
    dataDir.mkdirs()
    val staging = new File(root, s".graft-stage-${java.util.UUID.randomUUID}")
    df.write.parquet(staging.getPath)
    val moved = Option(staging.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).map { f =>
        val dst = new File(dataDir, s"${java.util.UUID.randomUUID}.parquet")
        Files.move(f.toPath, dst.toPath)
        dst
      }.toSeq
    Option(staging.listFiles()).getOrElse(Array.empty)
      .foreach(f => Files.deleteIfExists(f.toPath))
    Files.deleteIfExists(staging.toPath)
    require(moved.nonEmpty, s"no data files produced for $tablePath")
    val hasMeta = Option(metaDir.listFiles()).getOrElse(Array.empty)
      .exists(_.getName.matches("v\\d+\\.metadata\\.json"))
    val (priorSnaps, priorLive, version) =
      if (hasMeta) {
        val mf = currentMetadataFile(tablePath)
        val v = mf.getName.stripPrefix("v").stripSuffix(".metadata.json").toLong
        (parseMeta(mf).snapshots, liveFiles(tablePath), v + 1)
      } else (Seq.empty[Snapshot], Seq.empty[String], 1L)
    val sid = (priorSnaps.map(_.snapshotId) :+ 0L).max + 1
    val entries = priorLive.map(p => FixtureEntry(0, p, 0)) ++
      moved.map(f => FixtureEntry(1, f.getPath, 0))
    val snapJson = writeSnapshot(metaDir, sid, entries)
    val priorJsons = priorSnaps.map(s =>
      s"""{"snapshot-id":${s.snapshotId},"manifest-list":"${s.manifestList}"}""")
    writeMetadataVersion(metaDir, tablePath, version, sid,
      priorJsons :+ snapJson)
    sid
  }
}
