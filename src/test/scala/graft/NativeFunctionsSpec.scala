package graft

import org.apache.spark.sql.functions._

import graft.functions.{ConfigUdfLoader, NativeFunctions}
import graft.operators.Similarity

/** Custom function surfaces: the native codegen'd cosine expression and the
  * config-declared UDF loader (reference WASM-UDF capability).
  */
class NativeFunctionsSpec extends SparkSpec {

  test("native cosine_sim matches the composable cosine exactly") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50).cache()
    NativeFunctions.register(spark)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b"))
    val both = pairs.select(
      call_function("cosine_sim", col("va"), col("vb")).as("native"),
      Similarity.cosine(col("va"), col("vb")).as("composed"))
    // bit-identical: same fold order, same double arithmetic
    assert(both.filter(col("native") =!= col("composed")).count() === 0)
  }

  test("native l2_sq matches the composable zip_with fold exactly") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(50).cache()
    NativeFunctions.register(spark)
    val pairs = emb.select(col("vec_id").as("a"), col("embedding").as("va"))
      .crossJoin(emb.select(col("vec_id").as("b"), col("embedding").as("vb")))
      .filter(col("a") < col("b"))
    val composed = aggregate(
      zip_with(col("va").cast("array<double>"), col("vb").cast("array<double>"),
        (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, e) => acc + e)
    val both = pairs.select(
      call_function("l2_sq", col("va"), col("vb")).as("native"),
      composed.as("composed"))
    // bit-identical: same sequential array-order accumulation
    assert(both.filter(col("native") =!= col("composed")).count() === 0)
    // null propagation
    import spark.implicits._
    val nulls = Seq((Array(1.0f, 2.0f))).toDF("x")
      .select(call_function("l2_sq", col("x"), lit(null).cast("array<float>")))
      .head
    assert(nulls.isNullAt(0))
  }

  test("cosine_sim handles double arrays, nulls, and SQL invocation") {
    NativeFunctions.register(spark)
    import spark.implicits._
    val df = Seq(
      (Array(1.0, 0.0), Array(1.0, 0.0)),
      (Array(1.0, 0.0), Array(0.0, 1.0))).toDF("x", "y")
    val sims = df.select(call_function("cosine_sim", col("x"), col("y"))).collect()
    assert(math.abs(sims(0).getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(sims(1).getDouble(0)) < 1e-12)
    df.createOrReplaceTempView("cos_t")
    val viaSql = spark.sql("SELECT cosine_sim(x, y) AS s FROM cos_t ORDER BY s").collect()
    assert(viaSql.length === 2)
    val withNull = spark.sql("SELECT cosine_sim(x, NULL) FROM cos_t").collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("cosine_sim rejects non-array inputs at analysis") {
    NativeFunctions.register(spark)
    intercept[Exception](spark.sql("SELECT cosine_sim(1, 2)").collect())
  }

  test("config-declared UDFs load reflectively and register SQL functions") {
    val names = ConfigUdfLoader.load(spark,
      Map("udf.classes" -> "graft.functions.ExampleAddUdf"))
    assert(names === Seq("graft_add"))
    assert(spark.sql("SELECT graft_add(20L, 22L) AS s").head.getLong(0) === 42L)
    assert(ConfigUdfLoader.load(spark, Map.empty).isEmpty)
  }
}
