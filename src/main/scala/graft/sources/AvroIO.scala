package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro read/write without the spark-avro module (not on the offline
  * classpath): flat-schema Object Container Files over the avro-mapred
  * Hadoop formats that ARE shipped with Spark. This EXTENDS the
  * reference's source set for the pipeline brief — the reference's format
  * detection covers parquet/csv/json/vortex only (`src/db.rs:37-52`);
  * Avro is the interchange format training-data pipelines commonly
  * ingest, so it gets the same `CREATE EXTERNAL TABLE` treatment. The
  * bridge is thin: Row → GenericRecord per partition on write (each task
  * emits one container file — fully distributed, no driver funnel), and
  * GenericRecord → Row on read with the writer schema lifted off the first
  * file's header (one bounded driver read; the data scan itself is the
  * normal split-parallel Hadoop path).
  *
  * Scope: flat record schemas of the primitive types below plus
  * date/timestamp logical types — the TPC-H/documents surface. Nested and
  * decimal columns fail loudly rather than corrupting silently.
  */
object AvroIO {

  /** Avro schema JSON for a flat StructType (nullable fields become
    * `["null", T]` unions, Spark's own convention).
    */
  private[sources] def avroSchemaJson(schema: StructType, name: String): String = {
    // Avro names are [A-Za-z_][A-Za-z0-9_]*; interpolating anything else
    // into the JSON would corrupt the schema (e.g. a quote in a column
    // name), so fail loudly instead
    schema.fields.foreach { f =>
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"AvroIO: column name '${f.name}' is not a valid Avro field name")
    }
    def prim(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case DateType => "{\"type\":\"int\",\"logicalType\":\"date\"}"
      case TimestampType => "{\"type\":\"long\",\"logicalType\":\"timestamp-micros\"}"
      case TimestampNTZType =>
        "{\"type\":\"long\",\"logicalType\":\"local-timestamp-micros\"}"
      case other => sys.error(
        s"AvroIO supports flat primitive schemas; got ${other.catalogString}")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null", ${prim(f.dataType)}]""" else prim(f.dataType)
      s"""{"name":"${f.name}","type":$t}"""
    }
    s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}"""
  }

  /** StructType for a flat Avro record schema (inverse of
    * [[avroSchemaJson]]; unwraps `["null", T]` unions to nullable fields).
    */
  private[sources] def structType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"AvroIO reads record schemas, got ${schema.getType}")
    def unwrap(s: Schema): (Schema, Boolean) =
      if (s.getType == Schema.Type.UNION) {
        val branches = s.getTypes
        import scala.jdk.CollectionConverters._
        val nonNull = branches.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"unsupported union ${s}")
        (nonNull.head, branches.size > nonNull.size)
      } else (s, false)
    def dt(s: Schema): DataType = {
      val logical = Option(s.getLogicalType).map(_.getName)
      (s.getType, logical) match {
        case (Schema.Type.INT, Some("date")) => DateType
        case (Schema.Type.LONG, Some("timestamp-micros")) => TimestampType
        case (Schema.Type.LONG, Some("local-timestamp-micros")) => TimestampNTZType
        case (Schema.Type.LONG, _) => LongType
        case (Schema.Type.INT, _) => IntegerType
        case (Schema.Type.DOUBLE, _) => DoubleType
        case (Schema.Type.FLOAT, _) => FloatType
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.STRING, _) => StringType
        case (Schema.Type.BYTES, _) => BinaryType
        case (t, _) => sys.error(s"AvroIO: unsupported avro type $t")
      }
    }
    import scala.jdk.CollectionConverters._
    StructType(schema.getFields.asScala.map { f =>
      val (s, nullable) = unwrap(f.schema())
      StructField(f.name(), dt(s), nullable)
    }.toArray)
  }

  /** Write `df` as Avro container files under `path`, one file per
    * partition (the distributed path — no coalesce, no driver funnel).
    */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchemaJson(df.schema, "graft_record")
    val sparkSchema = df.schema
    val job = Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    job.getConfiguration.set("avro.schema.output.key", schemaJson)
    val pairs = df.rdd.mapPartitions { it =>
      // Schema isn't serializable: parse per partition from the JSON
      val schema = new Schema.Parser().parse(schemaJson)
      val fieldSchemas = sparkSchema.fields
      it.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fieldSchemas.length) {
          rec.put(i, toAvro(row, i, fieldSchemas(i).dataType))
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    pairs.saveAsNewAPIHadoopFile(path,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  private def toAvro(row: Row, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType => java.lang.Long.valueOf(row.getLong(i))
      case IntegerType => java.lang.Integer.valueOf(row.getInt(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case FloatType => java.lang.Float.valueOf(row.getFloat(i))
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case StringType => row.getString(i)
      case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
      // branch on the runtime value class, not the configured external
      // type: with spark.sql.datetime.java8API.enabled the row carries
      // LocalDate/Instant instead of the legacy java.sql types
      case DateType => row.get(i) match {
        case d: java.sql.Date =>
          java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
        case d: java.time.LocalDate =>
          java.lang.Integer.valueOf(d.toEpochDay.toInt)
        case other => sys.error(s"AvroIO: unexpected date value $other")
      }
      case TimestampType => row.get(i) match {
        case ts: java.sql.Timestamp =>
          java.lang.Long.valueOf(ts.getTime * 1000L + ts.getNanos / 1000 % 1000)
        case ins: java.time.Instant =>
          java.lang.Long.valueOf(
            Math.addExact(Math.multiplyExact(ins.getEpochSecond, 1000000L),
              ins.getNano / 1000L))
        case other => sys.error(s"AvroIO: unexpected timestamp value $other")
      }
      case TimestampNTZType =>
        val ldt = row.getAs[java.time.LocalDateTime](i)
        java.lang.Long.valueOf(
          ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
            ldt.getNano / 1000L)
      case other => sys.error(s"AvroIO: unsupported type ${other.catalogString}")
    }

  /** Read the Avro container files under `path` into a DataFrame. The
    * writer schema comes from the first file's header (a bounded, driver-
    * side metadata read, like a parquet footer probe); the record scan is
    * the split-parallel Hadoop input format.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schema = headerSchema(spark, path)
    val schemaJson = schema.toString
    val sparkSchema = structType(schema)
    val fields = sparkSchema.fields
    val rows = spark.sparkContext.newAPIHadoopFile(
        s"$path/*.avro",
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]], classOf[NullWritable])
      .map { case (k, _) =>
        // copy out immediately: Hadoop reuses the record object
        val rec = k.datum()
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          vals(i) = fromAvro(rec.get(i), fields(i).dataType)
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    // schemaJson captured only to keep the closure free of Schema
    require(schemaJson.nonEmpty)
    spark.createDataFrame(rows, sparkSchema)
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => v.toString // Utf8 → String
      case BinaryType =>
        val bb = v.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case DateType =>
        java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Integer].longValue()))
      case TimestampType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case TimestampNTZType =>
        val micros = v.asInstanceOf[java.lang.Long].longValue()
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case _ => v
    }

  /** Writer schema from the first container file's header. */
  private def headerSchema(spark: SparkSession, path: String): Schema = {
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    val p = new HPath(path)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val file = fs.listStatus(p).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).headOption
      .getOrElse(sys.error(s"AvroIO: no .avro files under $path"))
    val in = fs.open(file)
    try {
      val reader = new org.apache.avro.file.DataFileStream(
        in, new org.apache.avro.generic.GenericDatumReader[GenericRecord]())
      try reader.getSchema finally reader.close()
    } finally in.close()
  }

  /** `CREATE EXTERNAL TABLE name STORED AS AVRO LOCATION loc` hook: the
    * read path above registered as a temp view (same pattern as
    * [[DeltaLog.register]]).
    */
  def register(spark: SparkSession, name: String, loc: String): DataFrame = {
    val df = read(spark, loc)
    df.createOrReplaceTempView(name)
    df
  }
}
