package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Every registry query runs at sf0.001 and satisfies cheap intrinsic
  * invariants. The exhaustive value check is the DuckDB-oracle gate
  * (graft.Verify + scripts/check.py); these specs catch regressions fast.
  */
class QueriesSpec extends SparkSpec {

  test("all registry queries execute at sf0.001") {
    Registry.all.foreach { q =>
      val df = q.run(spark, sf0001)
      val n = df.count()
      assert(n >= 0, s"${q.name} failed to execute")
    }
  }

  test("query names are unique and oracles non-empty") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size)
    Registry.all.flatMap(_.oracle).foreach(o => assert(o.trim.nonEmpty))
  }

  test("q01 groups by returnflag x linestatus") {
    val rows = Registry.byName("q01_pricing_summary").run(spark, sf0001).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val counts = rows.map(_.getAs[Long]("count_order"))
    assert(counts.forall(_ > 0))
  }

  test("w01 keeps at most 3 suppliers per nation, ranks consistent") {
    val rows = Registry.byName("w01_window_rank").run(spark, sf0001).collect()
    val perNation = rows.groupBy(_.getAs[String]("n_name"))
    assert(perNation.values.forall(_.length <= 3))
    assert(rows.forall(r => r.getAs[Long]("rn") >= 1 && r.getAs[Long]("rn") <= 3))
  }

  test("e02 sessions are positive and bounded by events") {
    val rows = Registry.byName("e02_sessionization").run(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sessions = r.getAs[Long]("n_sessions")
      val events = r.getAs[Long]("n_events")
      assert(sessions >= 1 && sessions <= events)
    }
  }
}
