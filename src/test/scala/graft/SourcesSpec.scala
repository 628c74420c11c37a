package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Source/sink coverage (SURVEY §2.1/§2.2): CSV and NDJSON round-trips of
  * the parquet testdata, plus writer output shapes.
  */
class SourcesSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-sources").toString

  test("CSV write + header-read round-trips lineitem aggregates") {
    val li = Tables.load(spark, sf0001, "lineitem")
      .select("l_orderkey", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(s"$tmp/li_csv")
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$tmp/li_csv")
    assert(back.count() === li.count())
    val a = li.agg(sum("l_quantity")).head.getDouble(0)
    val b = back.agg(sum("l_quantity")).head.getDouble(0)
    assert(math.abs(a - b) < 1e-6)
  }

  test("NDJSON write + read round-trips orders") {
    val o = Tables.load(spark, sf0001, "orders")
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    o.write.mode("overwrite").json(s"$tmp/o_json")
    val back = spark.read.json(s"$tmp/o_json")
    assert(back.count() === o.count())
    assert(back.columns.sorted === o.columns.sorted)
  }

  test("parquet writer round-trips a query result exactly") {
    val df = queries.Registry.byName("q01_pricing_summary").run(spark, sf0001)
    df.write.mode("overwrite").parquet(s"$tmp/q01")
    val back = spark.read.parquet(s"$tmp/q01")
    assert(back.collect().toSeq.toSet === df.collect().toSeq.toSet)
  }

  test("ORC round-trips via DDL registration and the -o writer (vortex substitute)") {
    val nation = Tables.load(spark, sf0001, "nation")
    nation.write.mode("overwrite").orc(s"$tmp/nation_orc")
    // reference DDL shape: STORED AS ORC (SURVEY §2.1 suggests ORC where
    // the reference offers the optional Vortex format)
    val ctx = new graft.exec.ExecutionContext(spark)
    ctx.sql("DROP TABLE IF EXISTS orc_nation")
    ctx.runScript(
      s"CREATE EXTERNAL TABLE orc_nation STORED AS ORC LOCATION '$tmp/nation_orc'")
    val back = ctx.sql("SELECT * FROM orc_nation")
    assert(back.count() === nation.count())
    assert(back.columns.sorted === nation.columns.sorted)
    // single-file writer accepts .orc
    val out = s"$tmp/out.orc"
    cli.Writers.write(nation, out)
    val single = spark.read.orc(out)
    assert(single.count() === nation.count())
  }
}
