package graft.functions

import org.apache.spark.sql.SparkSession

/** Config-declared user functions (reference WASM UDFs,
  * `crates/datafusion-app/src/config.rs:256-269` + `wasm.rs:40-63`): the
  * capability is "functions declared in config, loaded at session start,
  * callable from SQL". The JVM analog loads implementations of [[GraftUdf]]
  * reflectively from class names listed under `udf.classes` (the WASM
  * runtime itself is out of scope offline — SURVEY §7.4).
  */
trait GraftUdf {
  /** SQL-callable function name(s) registered by this module. */
  def register(spark: SparkSession): Seq[String]
}

object ConfigUdfLoader {

  /** Load every class listed (comma-separated) in `udf.classes`, instantiate
    * and register. Returns registered function names.
    */
  def load(spark: SparkSession, conf: Map[String, String]): Seq[String] =
    conf.get("udf.classes").toSeq
      .flatMap(_.split(',').map(_.trim).filter(_.nonEmpty))
      .flatMap { cls =>
        val udf = Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[GraftUdf]
        udf.register(spark)
      }
}

/** Example module mirroring the reference's `wasm_add(Int64, Int64) -> Int64`
  * fixture (`udfs-wasm/src/native/row.rs:188-219`).
  */
class ExampleAddUdf extends GraftUdf {
  override def register(spark: SparkSession): Seq[String] = {
    spark.udf.register("graft_add", (a: Long, b: Long) => a + b)
    Seq("graft_add")
  }
}
