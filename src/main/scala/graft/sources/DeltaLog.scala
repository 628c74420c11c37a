package graft.sources

import java.io.File
import java.net.URLDecoder
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.server.MiniJson

/** Minimal read-only Delta Lake table support (reference registers a
  * `DELTATABLE` factory, `crates/datafusion-app/src/extensions/deltalake.rs:
  * 36-52`; exercised by `tests/extension_cases/deltalake.rs:23-44`).
  *
  * A Delta table is parquet data files plus a `_delta_log` of JSON commits
  * (one action object per line: `add`, `remove`, `metaData`, `protocol`,
  * `commitInfo`) and optional parquet checkpoints. Reading the current
  * snapshot is: start from the latest checkpoint's file list if one exists,
  * replay the JSON commits after it in version order applying add/remove by
  * path, then scan the surviving parquet files.
  *
  * Scale posture: the log is METADATA — kilobytes of JSON per commit and a
  * checkpoint parquet that is tiny relative to the table — so replaying it
  * on the driver is the same driver-side listing cost every Delta reader
  * pays. The data files themselves are never listed or touched here; they
  * flow into a normal distributed parquet scan, keeping pushdown, pruning
  * and split planning intact.
  */
object DeltaLog {

  /** A live data file: absolute path plus the partition values the log
    * assigns it (partition column data lives in the log, not the parquet)
    * and its parsed add-action `stats` (None when the writer recorded
    * none — e.g. checkpoint-seeded entries — in which case the file must
    * always be scanned).
    */
  final case class LiveFile(path: String, partitionValues: Map[String, String],
      stats: Option[Map[String, Any]] = None,
      statsJson: Option[String] = None,
      recordedPath: String = "",
      dv: Option[DeltaDv.Descriptor] = None)

  /** Protocol gate. Two shapes are readable here: the classic
    * minReaderVersion <= 1 with no reader features, and minReaderVersion 3
    * whose readerFeatures are a subset of {deletionVectors} — the
    * table-features form a MoR DELETE upgrade commits, whose semantics
    * this reader fully implements ([[DeltaDv]] + the scan-side dead-row
    * filter below). Column mapping (minReaderVersion 2, or the
    * `columnMapping` feature) diverges physical from logical column names
    * and stays refused: replaying it blind would decode silently wrong.
    * The reference delegates this refusal to delta-rs, which rejects
    * unsupported reader versions; we do the same, loudly, at replay time.
    */
  private[sources] val DvFeature = "deletionVectors"

  private[sources] val CmFeature = "columnMapping"

  private def checkProtocol(minReader: Long, readerFeatures: Seq[Any],
      where: String): Unit = {
    val feats = readerFeatures.collect { case s: String => s }
    val ok =
      (minReader <= 2L && readerFeatures.isEmpty) ||
        (minReader == 3L && feats.size == readerFeatures.size &&
          feats.toSet.subsetOf(Set(DvFeature, CmFeature)))
    require(ok,
      s"unsupported Delta reader protocol in $where: minReaderVersion=" +
        s"$minReader, readerFeatures=${readerFeatures.mkString("[", ",", "]")}" +
        " — this reader supports minReaderVersion <= 2 with no reader " +
        s"features, or minReaderVersion 3 with readerFeatures ⊆ " +
        s"[$DvFeature, $CmFeature]. Column-mapping semantics are enforced " +
        "at scan time from the metaData (name and id modes decoded)")
  }

  // ---- COLUMN MAPPING --------------------------------------------------
  // minReaderVersion 2 / the columnMapping table feature: parquet files
  // store PHYSICAL field names (e.g. `col-<uuid>`), and the metaData
  // schemaString carries each logical field's
  // `delta.columnMapping.physicalName` metadata. NAME mode is decoded
  // here: scan with the fully physicalized schema (every nesting level —
  // parquet resolves nested fields by name), then rename back to logical
  // via a positional struct cast. ID mode resolves columns by parquet
  // footer field id (`delta.columnMapping.id` → `parquet.field.id` on
  // the request schema, Spark's native field-id matching) — physical
  // names and column order in the files are irrelevant by design.

  private[sources] val PhysNameKey = "delta.columnMapping.physicalName"

  private[sources] val FieldIdKey = "delta.columnMapping.id"

  /** Spark's parquet field-id resolution key: a request-schema field
    * carrying this metadata matches the footer column with that id, not
    * the name — exactly what Delta ID-mode (and Iceberg) readers need.
    */
  private[sources] val ParquetFieldIdKey = "parquet.field.id"

  /** `delta.columnMapping.mode` from the metaData configuration. */
  private[sources] def mappingMode(meta: Option[Map[String, Any]]): String =
    meta.flatMap(_.get("configuration"))
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .flatMap(_.get("delta.columnMapping.mode"))
      .collect { case s: String => s }
      .getOrElse("none")

  private def physName(f: org.apache.spark.sql.types.StructField): String =
    if (f.metadata.contains(PhysNameKey)) f.metadata.getString(PhysNameKey)
    else f.name

  /** Rename every nesting level to physical names (the on-disk shape). */
  private[sources] def physicalize(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case st: StructType => StructType(st.fields.map(f =>
        StructField(physName(f), physicalize(f.dataType), f.nullable)))
      case ArrayType(et, n) => ArrayType(physicalize(et), n)
      case MapType(k, v, n) => MapType(physicalize(k), physicalize(v), n)
      case other => other
    }
  }

  /** Strip mapping metadata, keeping logical names (the cast target). */
  private def logicalType(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = {
    import org.apache.spark.sql.types._
    dt match {
      case st: StructType => StructType(st.fields.map(f =>
        StructField(f.name, logicalType(f.dataType), f.nullable)))
      case ArrayType(et, n) => ArrayType(logicalType(et), n)
      case MapType(k, v, n) => MapType(logicalType(k), logicalType(v), n)
      case other => other
    }
  }

  /** The ID-mode request schema: LOGICAL names with `parquet.field.id`
    * metadata copied from each field's `delta.columnMapping.id` — Spark's
    * reader then resolves every column by footer field id and answers
    * with the logical name directly (no rename pass needed). Every
    * nesting level must carry an id; a field without one cannot be
    * resolved and refuses.
    */
  private def fieldIdRequestSchema(
      st: org.apache.spark.sql.types.StructType, tablePath: String)
      : org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    def walk(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map { f =>
        require(f.metadata.contains(FieldIdKey),
          s"ID-mode column-mapped table $tablePath: field '${f.name}' " +
            s"lacks $FieldIdKey in the metaData schemaString — cannot " +
            "resolve it against parquet footers")
        val md = new MetadataBuilder().withMetadata(f.metadata)
          .putLong(ParquetFieldIdKey, f.metadata.getLong(FieldIdKey)).build()
        StructField(f.name, walk(f.dataType), f.nullable, md)
      })
      case ArrayType(et, n) => ArrayType(walk(et), n)
      case MapType(k, v, n) => MapType(walk(k), walk(v), n)
      case other => other
    }
    walk(st).asInstanceOf[StructType]
  }

  /** ID-mode scan: request the logical schema annotated with parquet
    * field ids and let Spark's footer-id resolution do the matching —
    * the files' physical column NAMES (and their order) are irrelevant,
    * which is the whole point of id mode (real Delta assigns ids at
    * creation and never changes them across renames). DVs compose (the
    * filter rides `_metadata`). The field-id read conf is enabled
    * session-wide: it is inert for request schemas without id metadata,
    * which is every non-ID-mapped scan.
    */
  private def scanIdMapped(spark: SparkSession, tablePath: String,
      adds: Seq[LiveFile],
      logical: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (partFields, dataFields, physOf) = mappedPartitionSplit(logical, adds,
      tablePath)
    spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val request = fieldIdRequestSchema(
      org.apache.spark.sql.types.StructType(dataFields), tablePath)
    val base = applyDv(spark,
      spark.read.schema(request).parquet(adds.map(_.path): _*),
      adds, new File(tablePath))
    val withPv = injectPvMapped(spark, adds, base, partFields, physOf)
    // strip the mapping metadata from the result schema (the reader's
    // output contract is the clean logical shape, same as name mode);
    // partition columns cast from the log's strings to their declared
    // types, in schema order
    withPv.select(logical.fields.map { f =>
      col(s"`${f.name}`").cast(logicalType(f.dataType)).as(f.name)
    }.toSeq: _*)
  }

  /** Split a mapped table's logical schema into (partition fields, data
    * fields, logical → physical partition-key map). A logical field is a
    * partition field iff its PHYSICAL name keys every add's
    * `partitionValues` — the protocol stores pv keyed by physical names
    * under column mapping, while `metaData.partitionColumns` stays
    * logical. Mixed layouts (adds disagreeing on pv keys) refuse, same
    * as the unmapped injector.
    */
  private def mappedPartitionSplit(
      logical: org.apache.spark.sql.types.StructType, adds: Seq[LiveFile],
      tablePath: String): (Seq[org.apache.spark.sql.types.StructField],
        Seq[org.apache.spark.sql.types.StructField], Map[String, String]) = {
    val pvKeys = adds.headOption.map(_.partitionValues.keySet)
      .getOrElse(Set.empty)
    require(adds.forall(_.partitionValues.keySet == pvKeys),
      s"mixed partitioned/unpartitioned Delta table: add actions " +
        s"disagree on partition keys in $tablePath — rewrite with one " +
        "layout")
    def phys(f: org.apache.spark.sql.types.StructField): String =
      if (f.metadata.contains(PhysNameKey)) f.metadata.getString(PhysNameKey)
      else f.name
    val (part, data) = logical.fields.partition(f => pvKeys.contains(phys(f)))
    val resolved = part.map(f => f.name -> phys(f)).toMap
    require(resolved.values.toSet == pvKeys,
      s"partition keys ${pvKeys -- resolved.values} have no schema field " +
        s"whose physical name matches in $tablePath")
    (part.toSeq, data.toSeq, resolved)
  }

  /** [[injectPv]]'s column-mapped sibling: pv keys are PHYSICAL names,
    * output columns take the LOGICAL names (typed casts happen in the
    * caller's final projection). No-op for unpartitioned adds.
    */
  private def injectPvMapped(spark: SparkSession, adds: Seq[LiveFile],
      base: DataFrame,
      partFields: Seq[org.apache.spark.sql.types.StructField],
      physOf: Map[String, String]): DataFrame = {
    if (partFields.isEmpty) base
    else {
      import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val hadoopConf = spark.sessionState.newHadoopConf()
      val fileKey = "__graft_delta_file"
      val rows = adds.map { a =>
        val p = new org.apache.hadoop.fs.Path(a.path)
        val qualified = p.getFileSystem(hadoopConf).makeQualified(p)
          .toUri.toString
        org.apache.spark.sql.Row.fromSeq(qualified +:
          partFields.map(f => a.partitionValues.get(physOf(f.name)).orNull))
      }
      val mapSchema = StructType(StructField(fileKey, StringType) +:
        partFields.map(f => StructField(f.name, StringType)))
      val fileToPv = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), mapSchema)
      base.withColumn(fileKey, input_file_name())
        .join(broadcast(fileToPv), Seq(fileKey))
        .drop(col(fileKey))
    }
  }

  /** Re-attach EXPLICIT per-path partition tuples to a scan of arbitrary
    * parquet paths — the change-feed derivation's pv seam (the live-set
    * injectors key off add actions; a feed replays DEAD epochs whose
    * files left the live set long ago). Same broadcast
    * (file -> tuple) join on `input_file_name()` as the snapshot
    * readers; output columns take the LOGICAL partition field names,
    * cast to their declared types.
    */
  private def injectPvByPath(spark: SparkSession, base: DataFrame,
      pathPv: Seq[(String, Map[String, String])],
      partFields: Seq[org.apache.spark.sql.types.StructField],
      keyOf: String => String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val hadoopConf = spark.sessionState.newHadoopConf()
    val fileKey = "__graft_delta_file"
    val rows = pathPv.map { case (p, pv) =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val qualified = hp.getFileSystem(hadoopConf).makeQualified(hp)
        .toUri.toString
      org.apache.spark.sql.Row.fromSeq(qualified +:
        partFields.map(f => pv.get(keyOf(f.name)).orNull))
    }
    val mapSchema = StructType(StructField(fileKey, StringType) +:
      partFields.map(f => StructField(f.name, StringType)))
    val fileToPv = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), mapSchema)
    val joined = base.withColumn(fileKey, input_file_name())
      .join(broadcast(fileToPv), Seq(fileKey))
      .drop(col(fileKey))
    partFields.foldLeft(joined)((d, f) =>
      d.withColumn(f.name, col(s"`${f.name}`")
        .cast(logicalType(f.dataType))))
  }

  /** Mapped decode of ARBITRARY parquet paths (no DV application, no
    * live-set plumbing) — the change-feed derivation's seam: NAME mode
    * reads the physicalized schema and renames positionally; ID mode
    * resolves by footer field id. Because resolution keys on
    * physicalName/id — which NEVER change — one logical schema decodes
    * files written under ANY earlier logical names, which is what makes
    * a feed across renames serve the range-end names transparently.
    */
  private[sources] def scanMappedPaths(spark: SparkSession,
      tablePath: String,
      mode: String, logical: org.apache.spark.sql.types.StructType,
      paths: Seq[String], withChangeType: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    // cdc files carry the physicalized columns PLUS `_change_type`
    // (never mapped — the protocol reserves it); with field-id reading
    // enabled, fields lacking id metadata fall back to name matching,
    // so one request schema serves both resolution rules
    val ctField = StructField("_change_type", StringType)
    val ctCols = if (withChangeType) Seq(col("`_change_type`")) else Seq.empty
    mode match {
      case "name" =>
        val physical = physicalize(logical)
          .asInstanceOf[StructType]
        val request =
          if (withChangeType) StructType(physical.fields :+ ctField)
          else physical
        spark.read.schema(request).parquet(paths: _*)
          .select(logical.fields.zip(physical.fields).map { case (lf, pf) =>
            col(s"`${pf.name}`").cast(logicalType(lf.dataType)).as(lf.name)
          }.toSeq ++ ctCols: _*)
      case "id" =>
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        val idSchema = fieldIdRequestSchema(logical, tablePath)
        val request =
          if (withChangeType) StructType(idSchema.fields :+ ctField)
          else idSchema
        spark.read.schema(request).parquet(paths: _*)
          .select(logical.fields.map { f =>
            col(s"`${f.name}`").cast(logicalType(f.dataType)).as(f.name)
          }.toSeq ++ ctCols: _*)
      case other => throw new IllegalArgumentException(
        s"unsupported delta.columnMapping.mode '$other' in $tablePath")
    }
  }

  /** NAME-mode scan: physical-schema read + positional cast back to
    * logical names at every nesting level. DVs compose (the filter rides
    * `_metadata`, not column names).
    */
  private def scanNameMapped(spark: SparkSession, tablePath: String,
      adds: Seq[LiveFile],
      logical: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (partFields, dataFields, physOf) = mappedPartitionSplit(logical, adds,
      tablePath)
    val dataLogical = org.apache.spark.sql.types.StructType(dataFields)
    val physical = physicalize(dataLogical)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val base0 = applyDv(spark,
      spark.read.schema(physical).parquet(adds.map(_.path): _*),
      adds, new File(tablePath))
    // positional rename back to logical happens per data field; the
    // partition columns join in from the log under their logical names
    // and the final projection below casts and orders everything
    // (input_file_name() still resolves after a projection — it reads
    // the task's scan context, not a relation column)
    val decoded = base0.select(
      dataFields.zip(physical.fields).map { case (lf, pf) =>
        col(s"`${pf.name}`").as(lf.name)
      }: _*)
    val withPv = injectPvMapped(spark, adds, decoded, partFields, physOf)
    withPv.select(logical.fields.map { lf =>
      col(s"`${lf.name}`").cast(logicalType(lf.dataType)).as(lf.name)
    }.toSeq: _*)
  }

  /** Parse an add action's `deletionVector` descriptor (JSON-decoded map
    * form). Required fields per the protocol: storageType, pathOrInlineDv,
    * sizeInBytes, cardinality; offset only for on-disk DVs.
    */
  private[sources] def parseDv(m: Map[String, Any]): DeltaDv.Descriptor = {
    def str(k: String): String = m.get(k).collect { case s: String => s }
      .getOrElse(throw new IllegalArgumentException(
        s"deletionVector descriptor lacks required field $k"))
    def num(k: String): Option[Long] =
      m.get(k).collect { case d: Double => d.toLong }
    DeltaDv.Descriptor(str("storageType"), str("pathOrInlineDv"),
      num("offset"),
      num("sizeInBytes").getOrElse(
        throw new IllegalArgumentException(
          "deletionVector descriptor lacks sizeInBytes")),
      num("cardinality").getOrElse(
        throw new IllegalArgumentException(
          "deletionVector descriptor lacks cardinality")))
  }

  /** Snapshot at `versionAsOf` (time travel), or the current snapshot when
    * None: the live data files in first-added order. Time travel replays
    * the same log, truncated at the requested version; a checkpoint newer
    * than the requested version is skipped, which is only sound when the
    * full commit history back to version 0 is still present — enforced
    * loudly, since a log-retention cleanup would otherwise produce a
    * silently incomplete snapshot.
    */
  def liveAdds(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None): Seq[LiveFile] = {
    val root = new File(tablePath)
    val logDir = new File(root, "_delta_log")
    require(logDir.isDirectory,
      s"not a Delta table (no _delta_log): $tablePath")

    val allCommits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("""\d{20}\.json"""))
      .sortBy(_.getName)
    versionAsOf.foreach { v =>
      require(allCommits.exists(versionOf(_) == v),
        s"Delta version $v not found in $logDir (versions: " +
          s"${allCommits.map(versionOf).mkString(",")})")
    }
    val commits = versionAsOf match {
      case Some(v) => allCommits.filter(versionOf(_) <= v)
      case None => allCommits
    }

    // seed from the newest checkpoint at or below the newest usable commit,
    // if any; a checkpoint PAST the travel target cannot seed that target
    val checkpointVersion = lastCheckpointVersion(logDir)
      .filter(cp => versionAsOf.forall(cp <= _))
    versionAsOf.foreach { _ =>
      if (checkpointVersion.isEmpty)
        require(commits.nonEmpty && versionOf(commits.head) == 0L,
          s"time travel needs the full history from version 0 in $logDir " +
            s"(oldest present: ${commits.headOption.map(versionOf)})")
    }
    val live = mutable.LinkedHashMap.empty[String,
      (Map[String, String], Option[Map[String, Any]], Option[String],
        Option[DeltaDv.Descriptor])]
    checkpointVersion.foreach { v =>
      val cp = new File(logDir, f"$v%020d.checkpoint.parquet")
      require(cp.isFile, s"_last_checkpoint names a missing file: $cp")
      val cpAll = spark.read.parquet(cp.getPath)
      def structFields(colName: String): Seq[String] =
        cpAll.schema.find(_.name == colName).map(_.dataType).collect {
          case t: org.apache.spark.sql.types.StructType => t.fieldNames.toSeq
        }.getOrElse(Seq.empty)
      // the checkpoint carries the table's protocol action too — gate on it
      // before trusting any of its add entries
      val protoFields = structFields("protocol")
      if (protoFields.contains("minReaderVersion")) {
        val featExpr =
          if (protoFields.contains("readerFeatures"))
            "coalesce(protocol.readerFeatures, array())"
          else "array()"
        cpAll.where("protocol IS NOT NULL")
          .selectExpr("protocol.minReaderVersion", featExpr)
          .collect().foreach { r =>
            checkProtocol(r.getInt(0).toLong, r.getSeq[Any](1), cp.getName)
          }
      }
      // only rows with a non-null `add` carry live files
      val cpDf = cpAll.where("add IS NOT NULL")
      val addFields = structFields("add")
      val pvExpr =
        if (addFields.contains("partitionValues")) "add.partitionValues"
        else "map() AS pv"
      val statsExpr =
        if (addFields.contains("stats")) "add.stats"
        else "CAST(NULL AS STRING) AS stats"
      // the checkpoint carries deletionVector descriptors for DV tables —
      // decode through the same JSON parser the commit replay uses
      val dvExpr =
        if (addFields.contains("deletionVector")) "to_json(add.deletionVector)"
        else "CAST(NULL AS STRING) AS dv"
      cpDf.selectExpr("add.path", pvExpr, statsExpr, dvExpr)
        .collect().foreach { r =>
          val pv = Option(r.getMap[String, String](1))
            .map(_.toMap).getOrElse(Map.empty)
          val raw = Option(r.getString(2))
          val dv = Option(r.getString(3)).flatMap(MiniJson.parseObject)
            .map(parseDv)
          live += r.getString(0) ->
            ((pv, raw.flatMap(MiniJson.parseObject), raw, dv))
        }
    }

    commits
      .filter(f => checkpointVersion.forall(_ < versionOf(f)))
      .foreach { f =>
        Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
          .filter(_.trim.nonEmpty)
          .foreach { line =>
            val action = MiniJson.parseObject(line).getOrElse(
              throw new IllegalArgumentException(
                s"unparseable Delta action in ${f.getName}: $line"))
            action.get("protocol") match {
              case Some(m: Map[_, _]) =>
                val p = m.asInstanceOf[Map[String, Any]]
                val minReader = p.get("minReaderVersion")
                  .collect { case d: Double => d.toLong }.getOrElse(1L)
                val feats = p.get("readerFeatures")
                  .collect { case xs: Seq[_] => xs.toSeq }.getOrElse(Seq.empty)
                checkProtocol(minReader, feats, f.getName)
              case _ =>
            }
            action.get("add") match {
              case Some(m: Map[_, _]) =>
                val a = m.asInstanceOf[Map[String, Any]]
                // a MoR delete re-adds the SAME path with a deletionVector
                // descriptor — the LinkedHashMap update replaces the old
                // entry in place, exactly the protocol's replay rule
                val dv = a.get("deletionVector") match {
                  case Some(dm: Map[_, _]) =>
                    Some(parseDv(dm.asInstanceOf[Map[String, Any]]))
                  case _ => None
                }
                val pv = a.get("partitionValues") match {
                  case Some(pm: Map[_, _]) =>
                    // a JSON null value is a NULL partition value per the
                    // protocol (writers render it from the
                    // __HIVE_DEFAULT_PARTITION__ directory) — preserve the
                    // key with a null value so pruning treats it as a real,
                    // never-equal value and injection yields SQL NULL
                    pm.asInstanceOf[Map[String, Any]].collect {
                      case (k, v: String) => k -> v
                      case (k, null) => k -> (null: String)
                    }
                  case _ => Map.empty[String, String]
                }
                val rawStats = a.get("stats").collect { case s: String => s }
                live += pathOf(a, f) -> ((pv,
                  rawStats.flatMap(MiniJson.parseObject), rawStats, dv))
              case _ =>
            }
            action.get("remove") match {
              case Some(m: Map[_, _]) =>
                live -= pathOf(m.asInstanceOf[Map[String, Any]], f)
              case _ =>
            }
          }
      }

    live.toSeq.map { case (rel, (pv, stats, raw, dv)) =>
      // paths are table-root-relative and URL-encoded per the protocol;
      // absolute URIs pass through. The RECORDED (still-encoded) form is
      // kept too: remove/checkpoint actions must byte-match it, and
      // re-encoding a decoded path is not the identity for values
      // containing '%', '+' or '/'
      val abs =
        if (rel.contains("://") || rel.startsWith("/")) rel
        else new File(root, URLDecoder.decode(rel, "UTF-8")).getPath
      LiveFile(abs, pv, stats, raw, recordedPath = rel, dv = dv)
    }
  }

  /** Apply the live adds' DELETION VECTORS to a scan over exactly those
    * files: dead rows (named by `_metadata.file_path` + `row_index`
    * against each file's RoaringBitmapArray) are filtered out. The DV
    * BYTES ride the task closure in their compressed portable form —
    * never an enumerated (file, row) list, so a DV covering millions of
    * rows ships as kilobytes — and each task rehydrates the bitmaps once
    * (transient-lazy). No-op (the unchanged plan, full codegen) when no
    * add carries a DV. File identity is by basename, which every writer
    * here makes uuid-unique; enforced before trusting it.
    */
  private[sources] def applyDv(spark: SparkSession, df: DataFrame,
      adds: Seq[LiveFile], root: File): DataFrame = {
    import org.apache.spark.sql.functions.{col, udf}
    val withDv = adds.filter(_.dv.isDefined)
    if (withDv.isEmpty) return df
    val names = adds.map(a => new File(a.path).getName)
    require(names.distinct.size == names.size,
      s"duplicate data-file basenames in ${root.getPath} — deletion-vector " +
        "matching is by uuid-unique file name and cannot disambiguate")
    val dvBytes: Map[String, Array[Byte]] = withDv.map { a =>
      new File(a.path).getName -> DeltaDv.readBitmapBytes(root, a.dv.get)
    }.toMap
    val filter = new DeltaDv.RowFilter(dvBytes)
    val liveUdf = udf((file: String, idx: Long) => filter.live(file, idx))
    df.filter(liveUdf(col("_metadata.file_path"), col("_metadata.row_index")))
  }

  /** DATA SKIPPING: the live files whose add-action stats admit rows with
    * `column` in `[lo, hi]` (inclusive; either bound None = unbounded).
    * A file is pruned ONLY when its recorded [min, max] for the column
    * provably cannot intersect the range; files with no stats or no entry
    * for the column are always kept — skipping may only shrink the scan,
    * never the answer (nulls need no special case: stats min/max exclude
    * them and a null row fails the range filter anyway). At 100 TB over a
    * clustered layout (x06/x10 + the MERGE CoW path) this turns a key
    * predicate into opening the handful of overlapping files — the log
    * fold itself touches no data file.
    *
    * Returns (kept, totalLive). Comparison is numeric for JSON numbers
    * and lexicographic for strings, matching the writer's rendering.
    */
  def pruneByStats(spark: SparkSession, tablePath: String, column: String,
      lo: Option[Any], hi: Option[Any]): (Seq[LiveFile], Int) = {
    def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
      case (x: Double, y: Double) => Some(java.lang.Double.compare(x, y))
      case (x: Double, y: Number) => Some(java.lang.Double.compare(x, y.doubleValue))
      case (x: Number, y: Double) => Some(java.lang.Double.compare(x.doubleValue, y))
      case (x: Number, y: Number) => Some(java.lang.Double.compare(x.doubleValue, y.doubleValue))
      case (x: String, y: String) => Some(x.compareTo(y))
      case _ => None // incomparable: treat as unknown, keep the file
    }
    val adds = liveAdds(spark, tablePath)
    // on a column-mapped table the add stats are keyed by PHYSICAL names
    // (they come from the parquet footers) — translate the logical column
    // so data skipping works on mapped tables too; an unknown logical
    // name keeps the raw key (pruning may only shrink, never the answer)
    val statsKey = requireMappingReadable(spark, tablePath, None) match {
      case Some((_, logical)) =>
        logical.fields.find(_.name == column).map(physName).getOrElse(column)
      case None => column
    }
    val kept = adds.filter { f =>
      f.stats match {
        case Some(st) =>
          def bound(side: String): Option[Any] = st.get(side)
            .collect { case m: Map[_, _] =>
              m.asInstanceOf[Map[String, Any]].get(statsKey) }.flatten
          val belowLo = for {
            l <- lo; mx <- bound("maxValues"); c <- cmp(mx, l)
          } yield c < 0
          val aboveHi = for {
            h <- hi; mn <- bound("minValues"); c <- cmp(mn, h)
          } yield c > 0
          !(belowLo.getOrElse(false) || aboveHi.getOrElse(false))
        case None => true
      }
    }
    (kept, adds.size)
  }

  /** Range scan with data skipping: read ONLY the stat-admitted files,
    * then apply the predicate (skipping bounds the scan; the filter still
    * decides rows). Empty kept-set returns an empty frame with the
    * table's schema.
    */
  def readRange(spark: SparkSession, tablePath: String, column: String,
      lo: Option[Any], hi: Option[Any]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (kept, _) = pruneByStats(spark, tablePath, column, lo, hi)
    val base =
      if (kept.nonEmpty)
        requireMappingReadable(spark, tablePath, None) match {
          case Some((mode, logical)) =>
            // mapped modes: pruneByStats translated the logical column to
            // its physical stats key, so data skipping applies; the
            // logical-named scan then filters row-exactly
            if (mode == "name") scanNameMapped(spark, tablePath, kept, logical)
            else scanIdMapped(spark, tablePath, kept, logical)
          case None =>
            // stats bounds may only WIDEN under a DV (they describe the
            // physical file) — pruning stays sound; the DV filter then
            // drops the dead rows the kept files still physically hold
            applyDv(spark, spark.read.parquet(kept.map(_.path): _*), kept,
              new File(tablePath))
        }
      else { // schema from the full snapshot, zero rows
        read(spark, tablePath).limit(0)
      }
    val bounded = lo.fold(base)(l => base.filter(col(column) >= lit(l)))
    hi.fold(bounded)(h => bounded.filter(col(column) <= lit(h)))
  }

  /** TIMESTAMP-based time travel (`AS OF TIMESTAMP`): resolve the
    * newest version whose commit file was published at or before
    * `tsMillis`, exactly real Delta's rule (commit-file modification
    * times define the timeline), then delegate to version travel.
    * Refuses a timestamp before the first commit — there is no snapshot
    * to serve — and a log whose commits were expired below the target.
    */
  def readTimestampAsOf(spark: SparkSession, tablePath: String,
      tsMillis: Long): DataFrame = {
    val logDir = new File(tablePath, "_delta_log")
    require(logDir.isDirectory,
      s"not a Delta table (no _delta_log): $tablePath")
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("""\d{20}\.json"""))
      .sortBy(_.getName)
    val atOrBefore = commits.filter(_.lastModified <= tsMillis)
    require(atOrBefore.nonEmpty,
      s"no Delta commit at or before timestamp $tsMillis in $logDir " +
        s"(earliest: ${commits.headOption.map(_.lastModified)})")
    read(spark, tablePath, Some(versionOf(atOrBefore.last)))
  }

  /** Latest committed `txn` version per application id — the Delta
    * transaction-identifier mechanism a streaming sink uses for
    * exactly-once: each micro-batch commit carries
    * `{"txn":{"appId":…,"version":epoch}}`, and a retried batch whose
    * epoch is already recorded is SKIPPED instead of double-appended.
    * Replays JSON commits only (checkpoint txn columns not needed for
    * the sink's own recent epochs; a sink older than the retained log
    * restarts from its own checkpoint anyway).
    */
  /** The table's current `metaData` action: schemaString, partitionColumns,
    * format provider and configuration, as the LAST metaData in the JSON
    * commits (schema evolution replaces it), seeded from the checkpoint's
    * metaData row when the early commits have been expired. None only for
    * a log that never recorded one (not a table this writer produced).
    */
  def tableMetaData(spark: SparkSession, tablePath: String)
      : Option[Map[String, Any]] = tableMetaData(spark, tablePath, None)

  /** As-of-version form: the metaData in force AT `versionAsOf` — the
    * schema a time-travel read must decode with (a later schema evolution
    * replaces the action, but history keeps the old one).
    */
  def tableMetaData(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long]): Option[Map[String, Any]] = {
    val logDir = new File(tablePath, "_delta_log")
    if (!logDir.isDirectory) return None
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("""\d{20}\.json"""))
      .filter(f => versionAsOf.forall(v => versionOf(f) <= v))
      .sortBy(_.getName)
    var meta: Option[Map[String, Any]] = None
    lastCheckpointVersion(logDir)
      .filter(v => versionAsOf.forall(_ >= v)).foreach { v =>
      val cp = new File(logDir, f"$v%020d.checkpoint.parquet")
      if (cp.isFile) {
        val cpAll = spark.read.parquet(cp.getPath)
        if (cpAll.schema.fieldNames.contains("metaData")) {
          cpAll.where("metaData IS NOT NULL").selectExpr("to_json(metaData)")
            .collect().headOption.foreach { r =>
              meta = MiniJson.parseObject(r.getString(0))
            }
        }
      }
    }
    commits.foreach { f =>
      Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
        .filter(_.trim.nonEmpty).foreach { line =>
          MiniJson.parseObject(line).foreach { action =>
            action.get("metaData") match {
              case Some(m: Map[_, _]) =>
                meta = Some(m.asInstanceOf[Map[String, Any]])
              case _ =>
            }
          }
        }
    }
    meta
  }

  /** The metaData action's schema as a Catalyst StructType (None when no
    * metaData or an unparseable schemaString).
    */
  private[sources] def metaSchema(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None)
      : Option[org.apache.spark.sql.types.StructType] =
    tableMetaData(spark, tablePath, versionAsOf)
      .flatMap(_.get("schemaString"))
      .collect { case s: String => s }
      .flatMap(s => scala.util.Try(
        org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)

  def latestTxnVersions(tablePath: String): Map[String, Long] = {
    val logDir = new File(tablePath, "_delta_log")
    if (!logDir.isDirectory) return Map.empty
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("""\d{20}\.json"""))
      .sortBy(_.getName)
    val latest = mutable.Map.empty[String, Long]
    // seed from the checkpoint's txn rows (if any): the retry guard must
    // survive checkpoint + log expiry, or a retried epoch double-commits
    // right after routine log maintenance
    lastCheckpointVersion(logDir).foreach { v =>
      val cp = new File(logDir, f"$v%020d.checkpoint.parquet")
      if (cp.isFile) {
        val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
          org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
            new org.apache.hadoop.fs.Path(cp.getPath),
            new org.apache.hadoop.conf.Configuration()))
        val hasTxn =
          try reader.getFooter.getFileMetaData.getSchema.getFields.asScala
            .exists(_.getName == "txn")
          finally reader.close()
        if (hasTxn) {
          // tiny driver-side read: the checkpoint is metadata
          val spark = org.apache.spark.sql.SparkSession.active
          spark.read.parquet(cp.getPath).where("txn IS NOT NULL")
            .selectExpr("txn.appId", "txn.version").collect().foreach { r =>
              val app = r.getString(0)
              val ver = r.getLong(1)
              latest(app) = math.max(latest.getOrElse(app, Long.MinValue), ver)
            }
        }
      }
    }
    commits.foreach { f =>
      Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
        .filter(_.trim.nonEmpty).foreach { line =>
          MiniJson.parseObject(line).foreach { action =>
            action.get("txn") match {
              case Some(m: Map[_, _]) =>
                val t = m.asInstanceOf[Map[String, Any]]
                for {
                  app <- t.get("appId").collect { case s: String => s }
                  v <- t.get("version").collect { case d: Double => d.toLong }
                } latest(app) = math.max(latest.getOrElse(app, Long.MinValue), v)
              case _ =>
            }
          }
        }
    }
    latest.toMap
  }

  /** Metadata-only COUNT(*): the sum of every live add's recorded
    * `numRecords` — the log-fold analog of the parquet-footer COUNT rule
    * (plans/FooterCount), answering an unfiltered count without opening
    * ONE data file. None (caller must scan) unless EVERY live add
    * carries stats with numRecords: a single stats-less file makes the
    * fold unsound, and soundness beats cleverness.
    */
  def countFromStats(spark: SparkSession, tablePath: String): Option[Long] = {
    val adds = liveAdds(spark, tablePath)
    // a deletion vector keeps its file's PHYSICAL numRecords in stats;
    // the live count subtracts the descriptor's cardinality, which the
    // protocol requires to be exact — still a zero-data-file answer
    val counts = adds.map(a => a.stats.flatMap(_.get("numRecords").collect {
      case d: Double => d.toLong
    }).map(_ - a.dv.map(_.cardinality).getOrElse(0L)))
    if (counts.nonEmpty && counts.forall(_.isDefined))
      Some(counts.flatten.sum)
    else None
  }

  /** CHANGE DATA FEED read: every row change committed in versions
    * `[fromVersion, toVersion]` (inclusive; None = current), as the table
    * columns plus `_change_type` (insert / delete / update_preimage /
    * update_postimage), `_commit_version`, `_commit_timestamp` — the
    * Delta protocol's CDC read surface.
    *
    * Per-commit rule (the protocol's): when a commit carries `cdc`
    * actions, they ARE the change set (reading `_change_data/` files the
    * writer published); otherwise changes derive from the data actions —
    * `add dataChange:true` files are inserts, `remove dataChange:true`
    * files are deletes of their full content (readable until VACUUM
    * reclaims the tombstone — a vacuumed remove refuses loudly rather
    * than silently dropping changes). `dataChange:false` commits
    * (OPTIMIZE, DV purge, checkpointing) are invisible by construction.
    * A DV commit without cdc actions refuses: its add/remove pair
    * re-names the same file, so derivation cannot see which rows died.
    *
    * Scale posture: the feed reads ONLY each commit's changed files —
    * O(changed bytes) per version, never a table scan; each commit's
    * files decode through the metaData schema in force AT that version
    * (NULL-filling across evolutions via unionByName).
    */
  def tableChanges(spark: SparkSession, tablePath: String,
      fromVersion: Long, toVersion: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{lit, to_timestamp}
    val root = new File(tablePath)
    val logDir = new File(root, "_delta_log")
    require(logDir.isDirectory, s"not a Delta table (no _delta_log): $tablePath")
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("""\d{20}\.json"""))
      .sortBy(_.getName)
    require(commits.nonEmpty, s"no commits in $logDir")
    val maxV = toVersion.getOrElse(versionOf(commits.last))
    require(fromVersion <= maxV,
      s"empty change range: fromVersion $fromVersion > toVersion $maxV")
    // the retained log must cover the range — a checkpoint-expired prefix
    // cannot be replayed as a feed
    require(versionOf(commits.head) <= fromVersion,
      s"change feed start $fromVersion predates the retained log " +
        s"(oldest commit: ${versionOf(commits.head)}) in $logDir")
    // the property must cover the WHOLE range (real Delta's rule): a
    // commit made before enablement wrote no cdc actions, so serving it
    // would silently misreport in-place changes as plain add/removes
    require(cdfIsEnabled(spark, tablePath, maxV) &&
        cdfIsEnabled(spark, tablePath, fromVersion),
      s"change data feed is not enabled on $tablePath for the full range " +
        s"[$fromVersion, $maxV] (set delta.enableChangeDataFeed via " +
        "DeltaWrite.enableChangeDataFeed; history before the property is " +
        "not readable as a feed)")
    // COLUMN-MAPPED feeds decode EVERY version through the schema in
    // force at the END of the range: physicalName/columnMapping.id never
    // change, so one logical schema resolves files written under any
    // earlier logical names — a rename mid-range is transparent and the
    // whole feed serves the range-end names (real Delta's CDF behavior
    // under column mapping).
    val endMode = mappingMode(tableMetaData(spark, tablePath, Some(maxV)))
    val endSchema: Option[org.apache.spark.sql.types.StructType] =
      if (endMode == "none") None
      else Some(metaSchema(spark, tablePath, Some(maxV)).getOrElse(
        throw new IllegalArgumentException(
          s"column-mapped table without a parseable schemaString: " +
            tablePath)))
    // partition values resolve per file: from the action itself (adds
    // always carry them; every engine-written dataChange remove carries
    // them as extended metadata), or — for a FOREIGN writer's bare
    // remove — best-effort re-derived from the hive segments of the
    // recorded relative path: split BEFORE decoding (a %2F inside a
    // value must not become a path separator), decode each segment with
    // the hive rule (only %XX unescaped — a literal '+' survives).
    def pvOfAction(a: Map[String, Any], rel: String): Map[String, String] =
      a.get("partitionValues") match {
        case Some(pm: Map[_, _]) =>
          pm.asInstanceOf[Map[String, Any]].map {
            case (k, v: String) => k -> v
            case (k, _) => k -> null
          }
        case _ =>
          rel.split("/").dropRight(1)
            .map(seg =>
              URLDecoder.decode(seg.replace("+", "%2B"), "UTF-8"))
            .filter(_.contains("=")).map { seg =>
              val Array(k, v) = seg.split("=", 2)
              k -> (if (v == "__HIVE_DEFAULT_PARTITION__") null
                else URLDecoder.decode(v.replace("+", "%2B"), "UTF-8"))
            }.toMap
      }
    val perCommit = commits
      .filter(f => versionOf(f) >= fromVersion && versionOf(f) <= maxV)
      .flatMap { f =>
        val v = versionOf(f)
        var cdcPaths = List.empty[String]
        var addPaths = List.empty[(String, Map[String, String])]
        var addHasDv = false
        var removePaths = List.empty[(String, Map[String, String])]
        Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
          .filter(_.trim.nonEmpty).foreach { line =>
            MiniJson.parseObject(line).foreach { action =>
              action.get("cdc").foreach { case m: Map[_, _] =>
                val a = m.asInstanceOf[Map[String, Any]]
                cdcPaths ::= pathOf(a, f)
              case _ => }
              // a MISSING dataChange defaults to TRUE (the protocol's
              // rule for foreign minimal logs) — defaulting false would
              // silently DROP changes from the feed
              def isDataChange(a: Map[String, Any]): Boolean =
                a.get("dataChange") match {
                  case Some(b: java.lang.Boolean) => b.booleanValue()
                  case _ => true
                }
              action.get("add").foreach { case m: Map[_, _] =>
                val a = m.asInstanceOf[Map[String, Any]]
                if (isDataChange(a)) {
                  val p = pathOf(a, f)
                  addPaths ::= (p -> pvOfAction(a, p))
                  if (a.get("deletionVector").exists(_.isInstanceOf[Map[_, _]]))
                    addHasDv = true
                }
              case _ => }
              action.get("remove").foreach { case m: Map[_, _] =>
                val a = m.asInstanceOf[Map[String, Any]]
                if (isDataChange(a)) {
                  val p = pathOf(a, f)
                  removePaths ::= (p -> pvOfAction(a, p))
                }
              case _ => }
            }
          }
        if (cdcPaths.isEmpty && addPaths.isEmpty && removePaths.isEmpty) None
        else Some((v, f.lastModified, cdcPaths.reverse, addPaths.reverse,
          addHasDv, removePaths.reverse))
      }
    def resolve(rel: String): String =
      if (rel.contains("://") || rel.startsWith("/")) rel
      else new File(root, URLDecoder.decode(rel, "UTF-8")).getPath
    val frames = perCommit.flatMap {
      case (v, mtime, cdcPaths, addPaths, addHasDv, removePaths) =>
        // unmapped tables decode each commit with ITS epoch's schema
        // (evolution-faithful); mapped tables with the range-end schema
        // (rename-transparent, see above)
        val schemaAt =
          if (endMode == "none") metaSchema(spark, tablePath, Some(v))
          else endSchema
        // cdc files on a mapped table carry PHYSICALIZED columns plus
        // the reserved `_change_type` (our mutations stage them through
        // the mapped-append physicalization); decode resolves like the
        // data files — by physical name or footer field id — and the
        // change-type column by its reserved name
        def scan(paths: Seq[String], withChangeType: Boolean): DataFrame = {
          val abs = paths.map(resolve)
          abs.foreach(p => require(new File(p).isFile,
            s"change-feed file for version $v was vacuumed: $p"))
          if (endMode != "none")
            return scanMappedPaths(spark, tablePath, endMode,
              endSchema.get, abs, withChangeType)
          schemaAt match {
            case Some(st) if !withChangeType =>
              spark.read.schema(st).parquet(abs: _*)
            case Some(st) =>
              val withCt = org.apache.spark.sql.types.StructType(
                st.fields :+ org.apache.spark.sql.types.StructField(
                  "_change_type", org.apache.spark.sql.types.StringType))
              spark.read.schema(withCt).parquet(abs: _*)
            case None => spark.read.parquet(abs: _*)
          }
        }
        // DERIVED changes (pure-insert appends, whole-file removes) on a
        // PARTITIONED epoch: the data files physically lack the
        // partition columns (they live in the log), so the derivation
        // reads the data fields and re-injects each file's tuple —
        // exactly the snapshot reader's broadcast (file -> pv) join,
        // keyed on the pv maps the actions carried (or, for a foreign
        // writer's bare remove, the hive segments of its path)
        def scanDerived(pathPv: Seq[(String, Map[String, String])])
            : DataFrame = {
          import org.apache.spark.sql.functions.col
          import org.apache.spark.sql.types.StructType
          if (pathPv.forall(_._2.isEmpty))
            return scan(pathPv.map(_._1), withChangeType = false)
          val abs = pathPv.map { case (p, pv) => (resolve(p), pv) }
          abs.foreach { case (p, _) => require(new File(p).isFile,
            s"change-feed file for version $v was vacuumed: $p") }
          val schemaFull = schemaAt.getOrElse(
            throw new IllegalArgumentException(
              s"partitioned change feed needs a parseable metaData " +
                s"schema in $tablePath"))
          def keyOf(logical: String): String = {
            val f = schemaFull(logical)
            if (endMode != "none" && f.metadata.contains(PhysNameKey))
              f.metadata.getString(PhysNameKey)
            else logical
          }
          // the files' OWN pv keys decide which schema fields inject —
          // not the metaData's partitionColumns at this version: an
          // OVERWRITE redeclares partitionColumns=[] in the very commit
          // whose removes still reference partitioned files, and a
          // declared-columns split would schema-read the tuple column
          // (all-NULL) from files that physically lack it
          val pvKeys = abs.flatMap(_._2.keys).toSet
          val (partFields, dataFields) = schemaFull.fields
            .partition(f => pvKeys.contains(keyOf(f.name)))
          val base =
            if (endMode == "none")
              spark.read.schema(StructType(dataFields))
                .parquet(abs.map(_._1): _*)
            else scanMappedPaths(spark, tablePath, endMode,
              StructType(dataFields), abs.map(_._1))
          injectPvByPath(spark, base, abs, partFields.toSeq, keyOf)
            .select(schemaFull.fields.map(f => col(s"`${f.name}`")).toSeq: _*)
        }
        val changed: Seq[DataFrame] =
          if (cdcPaths.nonEmpty) Seq(scan(cdcPaths, withChangeType = true))
          else {
            require(!addHasDv,
              s"version $v of $tablePath re-adds a file with a deletion " +
                "vector but carries no cdc action — the changed rows " +
                "cannot be derived from add/remove (foreign writer " +
                "without CDF); read the snapshots instead")
            val ins = if (addPaths.isEmpty) Seq.empty else Seq(
              scanDerived(addPaths)
                .withColumn("_change_type", lit("insert")))
            val del = if (removePaths.isEmpty) Seq.empty else Seq(
              scanDerived(removePaths)
                .withColumn("_change_type", lit("delete")))
            ins ++ del
          }
        changed.map(_
          .withColumn("_commit_version", lit(v))
          // epoch millis → timestamp arithmetically (string rendering
          // would depend on the JVM default timezone)
          .withColumn("_commit_timestamp",
            (lit(mtime) / 1000.0).cast("timestamp")))
    }
    if (frames.isEmpty)
      read(spark, tablePath)
        .withColumn("_change_type", lit(null: String))
        .withColumn("_commit_version", lit(0L))
        .withColumn("_commit_timestamp",
          to_timestamp(lit(null: String)))
        .limit(0)
    else frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Is `delta.enableChangeDataFeed` set in the metaData in force at
    * `versionAsOf`?
    */
  private def cdfIsEnabled(spark: SparkSession, tablePath: String,
      versionAsOf: Long): Boolean =
    tableMetaData(spark, tablePath, Some(versionAsOf))
      .flatMap(_.get("configuration"))
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .flatMap(_.get("delta.enableChangeDataFeed"))
      .collect { case s: String => s }
      .exists(_.equalsIgnoreCase("true"))

  /** The table's current protocol action (minReaderVersion,
    * minWriterVersion, readerFeatures, writerFeatures), defaulting to
    * (1, 2, [], []) when the retained log carries none — the writer's
    * seam for feature upgrades (a MoR DELETE must commit the
    * deletionVectors feature before any reader trusts its adds) and for
    * checkpoints, which must carry the protocol forward verbatim.
    */
  def currentProtocol(tablePath: String): (Int, Int, Seq[String], Seq[String]) = {
    val logDir = new File(tablePath, "_delta_log")
    var proto = (1, 2, Seq.empty[String], Seq.empty[String])
    if (!logDir.isDirectory) return proto
    Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("""\d{20}\.json"""))
      .sortBy(_.getName)
      .foreach { f =>
        Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
          .filter(_.trim.nonEmpty).foreach { line =>
            MiniJson.parseObject(line).foreach { action =>
              action.get("protocol") match {
                case Some(m: Map[_, _]) =>
                  val p = m.asInstanceOf[Map[String, Any]]
                  def num(k: String, dflt: Int): Int = p.get(k)
                    .collect { case d: Double => d.toInt }.getOrElse(dflt)
                  def strs(k: String): Seq[String] = p.get(k)
                    .collect { case xs: Seq[_] =>
                      xs.collect { case s: String => s } }
                    .getOrElse(Seq.empty)
                  proto = (num("minReaderVersion", 1),
                    num("minWriterVersion", 2),
                    strs("readerFeatures"), strs("writerFeatures"))
                case _ =>
              }
            }
          }
      }
    proto
  }

  /** PARTITION PRUNING from the log alone: the live adds whose
    * `partitionValues` match every (column -> value) in `filter` — zero
    * data files opened or listed, the first and cheapest pruning lever
    * on a 100 TB partitioned table (the scan that follows touches only
    * the matching partitions' files). Files MISSING a filtered column
    * in their pv are kept (unpartitioned adds in a mixed table must not
    * be silently dropped — same may-only-shrink-the-scan rule as
    * [[pruneByStats]]). Returns (kept, totalLive).
    */
  def livePartitionAdds(spark: SparkSession, tablePath: String,
      filter: Map[String, String]): (Seq[LiveFile], Int) = {
    val adds = liveAdds(spark, tablePath)
    val kept = adds.filter(a => filter.forall { case (k, v) =>
      a.partitionValues.get(k).forall(_ == v)
    })
    (kept, adds.size)
  }

  /** Scan ONE partition slice: log-pruned file list, partition columns
    * re-injected from the kept adds' pv (they are not in the files).
    *
    * REFUSES a mixed table where a kept file lacks a filtered column in
    * its `partitionValues` (plain append + appendPartitioned on one
    * table): [[livePartitionAdds]] keeps such files by the may-only-
    * shrink pruning rule, but THIS method's contract is an exact
    * partition slice, and the unpartitioned files' rows may not satisfy
    * the predicate (their partition-column data lives in the parquet,
    * which pruning never reads). Filtering `read()` is the correct path
    * for mixed tables; silently returning extra rows is not.
    */
  def readPartition(spark: SparkSession, tablePath: String,
      filter: Map[String, String]): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (kept, _) = livePartitionAdds(spark, tablePath, filter)
    require(kept.nonEmpty,
      s"no live files match partition filter $filter in $tablePath")
    val unresolved = kept.filter(a =>
      filter.keys.exists(k => !a.partitionValues.contains(k)))
    require(unresolved.isEmpty,
      s"readPartition needs every kept file to record the filtered " +
        s"partition column(s) ${filter.keys.mkString(",")} in " +
        s"partitionValues; ${unresolved.size} live file(s) do not (mixed " +
        "partitioned/unpartitioned table) — their rows cannot be pruned " +
        "exactly from the log. Use read() with a residual filter instead")
    val pvCols = kept.flatMap(_.partitionValues.keys).distinct.sorted
    // distinct pv combinations among kept files; single-combination fast
    // path injects literals (no join at all — the common point lookup)
    val combos = kept.map(_.partitionValues).distinct
    if (combos.size == 1) {
      val base = applyDv(spark, spark.read.parquet(kept.map(_.path): _*),
        kept, new File(tablePath))
      pvCols.foldLeft(base)((df, c) =>
        df.withColumn(c, lit(combos.head.getOrElse(c, null: String))))
    } else {
      // mixed combos: the same broadcast file→pv injection as read(),
      // but over ONLY the kept files — pruning is preserved
      scanWithPv(spark, kept, new File(tablePath))
    }
  }

  /** Live data-file paths only (unpartitioned view of [[liveAdds]]). */
  def liveFiles(spark: SparkSession, tablePath: String): Seq[String] =
    liveAdds(spark, tablePath).map(_.path)

  /** Read the table's current snapshot as a DataFrame. Partition columns
    * come from the log's `partitionValues` (Delta stores them nowhere
    * else): ONE parquet scan over all live files, then a broadcast join of
    * `input_file_name()` against the (file -> partitionValues) map the log
    * replay produced. A per-partition union would build a plan with one
    * scan branch per distinct partition — fine at 3, fatal at 10⁴ (the
    * driver chokes planning the union long before execution); the single
    * scan keeps split planning, pushdown and pruning intact at any
    * partition count, and the map side is log metadata (bytes per file),
    * always broadcastable. An empty table (all files removed) still needs
    * a schema, which without a live file only the `metaData` action
    * carries — out of scope for this reader, so it refuses rather than
    * guessing.
    */
  def read(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long] = None): DataFrame =
    readAdds(spark, tablePath,
      liveAdds(spark, tablePath, versionAsOf), versionAsOf)

  /** Snapshot-decode a SUBSET of the current live set (by exact path) —
    * the copy-on-write writers' rewrite seam: a MERGE/DELETE reads ONLY
    * its touched files, but must read them exactly like the snapshot
    * reader would (metaData-schema decode, column-mapping resolution,
    * deletion vectors applied, partition values injected from the log).
    * Reading the paths raw instead would resurrect MoR-deleted rows
    * into the rewrite — the bug class this indirection exists to make
    * impossible.
    */
  private[sources] def readLivePaths(spark: SparkSession, tablePath: String,
      paths: Seq[String]): DataFrame = {
    val want = paths.toSet
    val adds = liveAdds(spark, tablePath).filter(a => want.contains(a.path))
    require(adds.size == want.size,
      s"${want.size - adds.size} path(s) not in the live set of $tablePath")
    readAdds(spark, tablePath, adds, None)
  }

  private def readAdds(spark: SparkSession, tablePath: String,
      adds: Seq[LiveFile], versionAsOf: Option[Long]): DataFrame = {
    require(adds.nonEmpty, s"Delta table has no live files: $tablePath")
    // SCHEMA EVOLUTION: an evolved table's pre-evolution files physically
    // lack the new columns, and footer inference would answer with
    // whichever file won — so unpartitioned tables decode through the
    // metaData schema IN FORCE AT the read version (time travel across an
    // evolution sees each epoch's own schema), NULL-filling columns a
    // file predates. Partitioned tables keep inference: their partition
    // columns live in the log, not the files, and are injected below.
    val root = new File(tablePath)
    requireMappingReadable(spark, tablePath, versionAsOf) match {
      case Some(("name", logical)) =>
        return scanNameMapped(spark, tablePath, adds, logical)
      case Some((_, logical)) => // "id"
        return scanIdMapped(spark, tablePath, adds, logical)
      case None => ()
    }
    if (adds.forall(_.partitionValues.isEmpty))
      metaSchema(spark, tablePath, versionAsOf) match {
        case Some(st) =>
          return applyDv(spark,
            spark.read.schema(st).parquet(adds.map(_.path): _*), adds, root)
        case None => () // no metaData recorded (external minimal log)
      }
    // with a metaData schema in force at the read version the
    // partitioned scan mirrors the unpartitioned discipline: DATA
    // columns decode through the declared schema (evolution-safe —
    // footer inference would let whichever file won decide whether an
    // evolved column exists), and the injected pv strings cast to
    // their declared types — the mapped scans' contract, symmetric for
    // unmapped tables
    metaSchema(spark, tablePath, versionAsOf) match {
      case Some(ms) =>
        import org.apache.spark.sql.functions.col
        import org.apache.spark.sql.types.StructType
        val pvKeys = adds.flatMap(_.partitionValues.keys).distinct
        val dataSchema = StructType(
          ms.fields.filterNot(f => pvKeys.contains(f.name)))
        pvKeys.filter(ms.fieldNames.contains).foldLeft(
          scanWithPv(spark, adds, root, Some(dataSchema)))((d, c) =>
          d.withColumn(c, col(s"`$c`").cast(logicalType(ms(c).dataType))))
      case None => scanWithPv(spark, adds, root)
    }
  }

  /** Mapping-mode gate shared by the scan paths: None for an unmapped
    * table (scan normally), Some((mode, logical schema)) for NAME mode
    * (physical-schema scan + rename) and ID mode (parquet footer
    * field-id resolution); any other declared mode — or a mapped table
    * without a parseable schema — refuses loudly rather than decoding
    * wrong.
    */
  private def requireMappingReadable(spark: SparkSession, tablePath: String,
      versionAsOf: Option[Long])
      : Option[(String, org.apache.spark.sql.types.StructType)] =
    mappingMode(tableMetaData(spark, tablePath, versionAsOf)) match {
      case "none" => None
      case m @ ("name" | "id") =>
        Some(m -> metaSchema(spark, tablePath, versionAsOf).getOrElse(
          throw new IllegalArgumentException(
            s"column-mapped table without a parseable schemaString: " +
              tablePath)))
      case other =>
        throw new IllegalArgumentException(
          s"delta.columnMapping.mode '$other' is not a Delta protocol " +
            s"mode in $tablePath — name and id are decoded; anything " +
            "else is refused rather than decoded wrong")
    }

  /** ONE distributed parquet scan over `adds` with the log's partition
    * values injected via a broadcast (file -> pv) map when any add
    * carries them (partition column data lives in the log, not the
    * parquet).
    */
  private def scanWithPv(spark: SparkSession,
      adds: Seq[LiveFile], root: File,
      dataSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : DataFrame =
    injectPv(spark, adds,
      applyDv(spark,
        dataSchema.fold(spark.read)(st => spark.read.schema(st))
          .parquet(adds.map(_.path): _*), adds, root))

  /** Snapshot read PLUS physical row-identity columns
    * (`__graft_dv_file` = the scan's file path, `__graft_dv_pos` = the
    * row index in its file), captured BEFORE the pv-injection join —
    * `_metadata` is a scan-relation pseudo-column and does not survive
    * the broadcast join that re-attaches partition columns. This is the
    * MoR delete writers' match-scan seam: a DELETE predicate may
    * reference BOTH partition and data columns, and the physical
    * identity of every matching row still resolves. Mapped tables are
    * the callers' concern (they refuse before calling).
    */
  private[sources] def readWithRowIdentity(spark: SparkSession,
      tablePath: String, onlyPaths: Option[Set[String]] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val adds0 = liveAdds(spark, tablePath)
    val adds = onlyPaths.fold(adds0)(ps => adds0.filter(a => ps(a.path)))
    require(adds.nonEmpty, s"Delta table has no live files: $tablePath")
    val root = new File(tablePath)
    val mode = mappingMode(tableMetaData(spark, tablePath))
    if (mode != "none") {
      val logical = metaSchema(spark, tablePath).getOrElse(
        throw new IllegalArgumentException(
          s"column-mapped table without a parseable schemaString: " +
            tablePath))
      return readWithRowIdentityMapped(spark, tablePath, adds, mode, logical)
    }
    // same schema discipline as read(): decode DATA columns through the
    // metaData schema when one exists (evolution-safe); partitioned
    // tables exclude their pv keys from it (those columns live in the
    // log and inject below)
    val base0 = metaSchema(spark, tablePath, None) match {
      case Some(st) =>
        val pvKeys = adds.flatMap(_.partitionValues.keys).distinct.toSet
        val dataSchema = org.apache.spark.sql.types.StructType(
          st.fields.filterNot(f => pvKeys.contains(f.name)))
        spark.read.schema(dataSchema).parquet(adds.map(_.path): _*)
      case None => spark.read.parquet(adds.map(_.path): _*)
    }
    val withId = applyDv(spark, base0, adds, root)
      .withColumn("__graft_dv_file", col("_metadata.file_path"))
      .withColumn("__graft_dv_pos", col("_metadata.row_index"))
    // typed pv, same contract as read(): a MoR/CoW predicate comparing a
    // partition column compares it at its declared type
    castPvToDeclared(spark, tablePath, injectPv(spark, adds, withId))
  }

  /** Mapped variant of [[readWithRowIdentity]]: the same logical decode
    * as read(), with every row's PHYSICAL identity (file path + row
    * index) captured from the raw scan BEFORE the logical projection —
    * what a mapped MoR delete needs (positions are physical; the
    * predicate is logical).
    */
  private def readWithRowIdentityMapped(spark: SparkSession,
      tablePath: String, adds: Seq[LiveFile], mode: String,
      logical: org.apache.spark.sql.types.StructType): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (partFields, dataFields, physOf) = mappedPartitionSplit(logical, adds,
      tablePath)
    val dataLogical = org.apache.spark.sql.types.StructType(dataFields)
    val idCols = Seq(col("__graft_dv_file"), col("__graft_dv_pos"))
    val raw = mode match {
      case "name" =>
        spark.read.schema(physicalize(dataLogical)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
          .parquet(adds.map(_.path): _*)
      case "id" =>
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        spark.read.schema(fieldIdRequestSchema(dataLogical, tablePath))
          .parquet(adds.map(_.path): _*)
      case other => throw new IllegalArgumentException(
        s"unsupported delta.columnMapping.mode '$other' in $tablePath")
    }
    val withId = applyDv(spark, raw, adds, new File(tablePath))
      .withColumn("__graft_dv_file", col("_metadata.file_path"))
      .withColumn("__graft_dv_pos", col("_metadata.row_index"))
    // name mode renames data fields back to logical; id mode's request
    // schema already carries logical names (resolution was by field id)
    val decoded = mode match {
      case "name" =>
        val physical = physicalize(dataLogical)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        withId.select(dataFields.zip(physical.fields).map {
          case (lf, pf) => col(s"`${pf.name}`").as(lf.name)
        } ++ idCols: _*)
      case _ => withId
    }
    val withPv = injectPvMapped(spark, adds, decoded, partFields, physOf)
    withPv.select(logical.fields.map { f =>
      col(s"`${f.name}`").cast(logicalType(f.dataType)).as(f.name)
    } ++ idCols: _*)
  }

  /** `metaData.partitionColumns` as recorded (LOGICAL names, in declared
    * order); empty when the log carries no metaData or none declared.
    */
  private[sources] def recordedPartitionColumns(spark: SparkSession,
      tablePath: String): Seq[String] =
    tableMetaData(spark, tablePath)
      .flatMap(_.get("partitionColumns"))
      .collect { case xs: Seq[_] => xs.collect { case s: String => s } }
      .getOrElse(Seq.empty)

  /** Live files keyed by the QUALIFIED URI a scan's
    * `_metadata.file_path` reports — the only safe join key between a
    * match scan's touched-file column and the log. Basenames are NOT
    * unique on adopted tables: Spark's partitionBy writes the same
    * part-NNNNN-jobUUID name into every partition directory, so a
    * basename map would silently collapse entries and a copy-on-write
    * rewrite would remove/rewrite the WRONG file.
    */
  private[sources] def byQualifiedPath(spark: SparkSession,
      adds: Seq[LiveFile]): Map[String, LiveFile] = {
    val hadoopConf = spark.sessionState.newHadoopConf()
    adds.map { a =>
      val p = new org.apache.hadoop.fs.Path(a.path)
      p.getFileSystem(hadoopConf).makeQualified(p).toString -> a
    }.toMap
  }

  /** Normalize a scan-reported file URI to the canonical form
    * [[byQualifiedPath]] keys on (Hadoop Path over the RAW filesystem
    * path). `_metadata.file_path` renders a percent-ESCAPED URI
    * (`file:/x`, `%` as `%25`), so the string must round-trip through
    * java.net.URI to decode the escaping before Path normalizes the
    * scheme/slash rendering; non-URI strings pass through Path as-is.
    */
  private[sources] def canonicalScanPath(uri: String): String =
    try new org.apache.hadoop.fs.Path(new java.net.URI(uri)).toString
    catch { case _: java.net.URISyntaxException =>
      new org.apache.hadoop.fs.Path(uri).toString }

  /** Logical -> physical column-name map from the current metaData
    * (identity for unmapped tables) — the single source for every
    * caller that must key partitionValues (recorded PHYSICAL under
    * column mapping) from logical names.
    */
  private[sources] def physByLogical(spark: SparkSession,
      tablePath: String): Map[String, String] =
    (mappingMode(tableMetaData(spark, tablePath)),
      metaSchema(spark, tablePath)) match {
      case (m, Some(ms)) if m != "none" =>
        val phys = physicalize(ms)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        ms.fieldNames.zip(phys.fieldNames).toMap
      case _ => Map.empty
    }

  /** Cast log-injected partition columns (strings — [[injectPv]]'s
    * output type) to their metaData-declared types. The mapped scan
    * paths already cast in their final projection; this is the UNMAPPED
    * partitioned frames' equivalent, used by the copy-on-write writers
    * so restaged rows and cdc files carry the declared types, not the
    * log's string rendering. No-op without a parseable metaData schema.
    */
  private[sources] def castPvToDeclared(spark: SparkSession,
      tablePath: String, df: DataFrame): DataFrame =
    metaSchema(spark, tablePath) match {
      case None => df
      case Some(ms) =>
        import org.apache.spark.sql.functions.col
        recordedPartitionColumns(spark, tablePath)
          .filter(c => df.columns.contains(c) && ms.fieldNames.contains(c))
          .foldLeft(df)((d, c) =>
            d.withColumn(c, col(s"`$c`").cast(logicalType(ms(c).dataType))))
    }

  /** Re-attach the log's partition values to `base` via a broadcast
    * (file -> pv) map — no-op for unpartitioned adds. */
  private def injectPv(spark: SparkSession, adds: Seq[LiveFile],
      base: DataFrame): DataFrame = {
    if (adds.forall(_.partitionValues.isEmpty)) base
    else {
      import org.apache.spark.sql.functions.{broadcast, col, input_file_name}
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val pvCols = adds.flatMap(_.partitionValues.keys).distinct.sorted
      // a mixed table (some files carry the column IN THE DATA, some in
      // pv) cannot be reconciled here: injection would either shadow real
      // data or produce duplicate columns depending on which footer won
      // schema inference — refuse loudly instead of decoding wrong. Two
      // independent detectors: the log alone (an add missing a pv key
      // another add carries — deterministic, no data touched) and the
      // inferred data schema (an external writer that put the column in
      // both places).
      val mixedLog = pvCols.filter(k =>
        adds.exists(a => !a.partitionValues.contains(k)))
      require(mixedLog.isEmpty,
        s"mixed partitioned/unpartitioned Delta table: add actions " +
          s"disagree on partition column(s) ${mixedLog.mkString(",")} — " +
          "the files without partitionValues keep that column in their " +
          "data, which log-side injection would shadow. Rewrite the " +
          "table with one layout")
      val collisions = pvCols.filter(base.columns.contains)
      require(collisions.isEmpty,
        s"mixed partitioned/unpartitioned Delta table: column(s) " +
          s"${collisions.mkString(",")} present both in data files and in " +
          "add-action partitionValues — rewrite the table with one layout")
      // map-side file keys must byte-match input_file_name(), which reports
      // the qualified, URL-encoded URI of the split's file — qualify through
      // the same Hadoop machinery the scan uses
      val hadoopConf = spark.sessionState.newHadoopConf()
      val fileKey = "__graft_delta_file"
      val rows = adds.map { a =>
        val p = new org.apache.hadoop.fs.Path(a.path)
        val qualified = p.getFileSystem(hadoopConf).makeQualified(p)
          .toUri.toString
        org.apache.spark.sql.Row.fromSeq(
          qualified +: pvCols.map(c => a.partitionValues.get(c).orNull))
      }
      val mapSchema = StructType(StructField(fileKey, StringType) +:
        pvCols.map(StructField(_, StringType)))
      val fileToPv = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), mapSchema)
      base.withColumn(fileKey, input_file_name())
        .join(broadcast(fileToPv), Seq(fileKey))
        .drop(col(fileKey))
    }
  }

  /** Register the snapshot under `name` (the DDL entry point for
    * `CREATE EXTERNAL TABLE ... STORED AS DELTATABLE`).
    */
  def register(spark: SparkSession, name: String, tablePath: String): DataFrame = {
    read(spark, tablePath).createOrReplaceTempView(name)
    spark.emptyDataFrame
  }

  private def versionOf(f: File): Long =
    f.getName.stripSuffix(".json").toLong

  /** The table's CHECK constraints: `delta.constraints.<name>`
    * configuration keys → (name, SQL expression). Empty for tables
    * without constraints.
    */
  def checkConstraints(spark: SparkSession, tablePath: String)
      : Map[String, String] =
    tableMetaData(spark, tablePath)
      .flatMap(_.get("configuration"))
      .collect { case m: Map[_, _] => m.asInstanceOf[Map[String, Any]] }
      .getOrElse(Map.empty)
      .collect {
        case (k, v: String) if k.startsWith("delta.constraints.") =>
          k.stripPrefix("delta.constraints.") -> v
      }

  /** The `delta_files` inspection surface: one row per LIVE file —
    * full path, on-disk size, add-action numRecords (null when the
    * writer recorded no stats), the partition tuple as a deterministic
    * `k=v` comma-join (null when unpartitioned), and whether a deletion
    * vector rides the file. Log-only: zero data files opened — the
    * Delta twin of [[IcebergLog.filesTable]].
    */
  def filesTable(spark: SparkSession, tablePath: String): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, LongType, StringType, StructField, StructType}
    import org.apache.spark.sql.Row
    val adds = liveAdds(spark, tablePath)
    def pvString(pv: Map[String, String]): String =
      if (pv.isEmpty) null
      else pv.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=${Option(v).getOrElse("null")}" }
        .mkString(",")
    val rows = adds.map { a =>
      val records = a.stats.flatMap(_.get("numRecords")).collect {
        case n: Double => java.lang.Long.valueOf(n.toLong)
        case n: java.lang.Number => java.lang.Long.valueOf(n.longValue())
      }.orNull
      Row(a.path, new File(a.path).length(), records,
        pvString(a.partitionValues), a.dv.nonEmpty)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("file_path", StringType, nullable = false),
        StructField("size_bytes", LongType, nullable = false),
        StructField("record_count", LongType),
        StructField("partition", StringType),
        StructField("has_deletion_vector", BooleanType, nullable = false))))
  }

  /** Commit history, newest first — the `DESCRIBE HISTORY` surface:
    * one row per JSON commit with (version, timestamp, operation,
    * operation_parameters). The operation comes from each commit's
    * commitInfo action (null when a foreign writer recorded none);
    * parameters render as a deterministic `k=v` comma-join. The timestamp
    * is the commit file's modification time — the same fallback real
    * Delta uses when commitInfo carries no inCommitTimestamp (ours
    * doesn't), and the clock [[readTimestampAsOf]] already travels by.
    * Commits aged out by [[DeltaWrite.expireLog]] no longer appear —
    * history is as deep as the retained log, exactly like real Delta.
    * Driver cost is O(retained commits): log-scale, never data-scale.
    */
  def history(spark: SparkSession, tablePath: String): DataFrame = {
    val logDir = new File(tablePath, "_delta_log")
    require(logDir.isDirectory,
      s"not a Delta table (no _delta_log): $tablePath")
    val commits = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.matches("""\d{20}\.json"""))
      .sortBy(_.getName).reverse
    require(commits.nonEmpty, s"no JSON commits in $logDir")
    val rows = commits.toSeq.map { f =>
      var op: String = null
      var params: String = null
      Files.readAllLines(f.toPath, StandardCharsets.UTF_8).asScala
        .filter(_.trim.nonEmpty).foreach { line =>
          MiniJson.parseObject(line).foreach { action =>
            action.get("commitInfo") match {
              case Some(ci: Map[_, _]) =>
                val m = ci.asInstanceOf[Map[String, Any]]
                op = m.get("operation")
                  .collect { case s: String => s }.orNull
                params = m.get("operationParameters")
                  .collect { case p: Map[_, _] =>
                    p.asInstanceOf[Map[String, Any]].toSeq
                      .sortBy(_._1)
                      .map { case (k, v) => s"$k=${String.valueOf(v)}" }
                      .mkString(",")
                  }.orNull
              case _ =>
            }
          }
        }
      org.apache.spark.sql.Row(versionOf(f),
        new java.sql.Timestamp(f.lastModified), op, params)
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("version", LongType, nullable = false),
        StructField("timestamp", TimestampType, nullable = false),
        StructField("operation", StringType),
        StructField("operation_parameters", StringType))))
  }

  /** Newest committed version the log knows — JSON commits or the
    * checkpoint (after log-retention cleanup the checkpoint may be the
    * only record of the counter).
    */
  def latestVersion(tablePath: String): Long = {
    val logDir = new File(tablePath, "_delta_log")
    val known = Option(logDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("""\d{20}\.json""")).map(versionOf).toSeq ++
      lastCheckpointVersion(logDir)
    require(known.nonEmpty, s"not a Delta table: $tablePath")
    known.max
  }

  private def pathOf(action: Map[String, Any], f: File): String =
    action.get("path") match {
      case Some(p: String) => p
      case _ => throw new IllegalArgumentException(
        s"Delta action without a path in ${f.getName}")
    }

  /** `_last_checkpoint` is a one-line JSON `{"version": N, ...}`. */
  private[sources] def lastCheckpointVersion(logDir: File): Option[Long] = {
    val f = new File(logDir, "_last_checkpoint")
    if (!f.isFile) None
    else MiniJson.parseObject(
        new String(Files.readAllBytes(f.toPath), StandardCharsets.UTF_8).trim)
      .flatMap(_.get("version"))
      .collect { case d: Double => d.toLong }
  }
}
