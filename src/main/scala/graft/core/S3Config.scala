package graft.core

import org.apache.spark.sql.SparkSession

/** Object-store configuration mapping (reference S3 extension:
  * `crates/datafusion-app/src/config.rs:160-225` builds an object_store S3
  * client from `[[execution.object_store.s3]]` entries;
  * `extensions/s3.rs:38-71` registers it for its url scheme). The Spark
  * analog is the Hadoop s3a connector: the same credential/endpoint fields
  * map onto `fs.s3a.*` keys in the session's Hadoop configuration.
  *
  * Purely a config translation — no network access happens until a path on
  * the scheme is actually read.
  */
object S3Config {

  /** reference key (within execution.object_store.s3.) -> fs.s3a.* key */
  val keyMap: Map[String, String] = Map(
    "aws_access_key_id" -> "fs.s3a.access.key",
    "aws_secret_access_key" -> "fs.s3a.secret.key",
    "aws_session_token" -> "fs.s3a.session.token",
    "aws_endpoint" -> "fs.s3a.endpoint",
    "aws_region" -> "fs.s3a.endpoint.region")

  private val Prefix = "execution.object_store.s3."

  /** Apply every `execution.object_store.s3.*` entry from a parsed config
    * (SessionFactory.parseConfig) to the session's Hadoop conf. Returns the
    * applied fs.s3a key/value pairs.
    */
  def apply(spark: SparkSession, conf: Map[String, String]): Map[String, String] = {
    val hc = spark.sparkContext.hadoopConfiguration
    val entries = conf.collect {
      case (k, v) if k.startsWith(Prefix) => k.stripPrefix(Prefix) -> v
    }
    val applied = entries.flatMap {
      case ("allow_http", v) =>
        // object_store's allow_http=true == s3a with SSL disabled +
        // path-style access (the localstack/minio shape the reference
        // tests against, `tests/extension_cases/s3.rs`)
        Map("fs.s3a.connection.ssl.enabled" -> (v.toLowerCase != "true").toString,
          "fs.s3a.path.style.access" -> "true")
      case (k, v) => keyMap.get(k).map(_ -> v).toMap
    }
    applied.foreach { case (k, v) => hc.set(k, v) }
    applied
  }
}
