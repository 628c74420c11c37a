package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** TPC-H-style query suite adapted to the driver testdata schema (FIXTURES.md
  * §1: no partsupp, no comment/phone/shipmode columns, DATE columns are
  * timestamps). Semantics follow the reference's shipped TPC-H workload
  * (reference `src/server/http/tpch.rs:18-711`); each query is implemented
  * with the DataFrame API (Catalyst plans joins/aggregates) and mirrored by a
  * DuckDB oracle.
  *
  * Numeric policy (see QueryDef): money/qty columns are cast to DECIMAL before
  * SUM so both engines aggregate exactly, then cast back to DOUBLE.
  */
object Tpch {

  // ---- shared expression helpers (Spark side) ----
  private def ts(s: String): Column = lit(s).cast("timestamp")
  private def money(c: Column): Column = c.cast("decimal(12,2)")
  private def rate(c: Column): Column = c.cast("decimal(4,2)")
  private def dec(c: Column): Column = c.cast("decimal(12,2)")
  /** l_extendedprice * (1 - l_discount), exact. */
  private def disc(price: Column, d: Column): Column =
    (money(price) * (lit(1) - rate(d))).cast("decimal(18,4)")
  private def asDouble(c: Column): Column = c.cast("double")

  // ---- shared SQL fragments (DuckDB oracle side) ----
  private val DISC =
    "CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(18,4))"
  private val REV = s"CAST(SUM($DISC) AS DOUBLE)"
  private def sumDec(col: String) = s"CAST(SUM(CAST($col AS DECIMAL(12,2))) AS DOUBLE)"

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  val queries: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    QueryDef("q01_pricing_summary", (s, d) => {
      val l = t(s, d, "lineitem")
      l.filter(col("l_shipdate") <= ts("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
          asDouble(sum(money(col("l_extendedprice")))).as("sum_base_price"),
          asDouble(sum(disc(col("l_extendedprice"), col("l_discount")))).as("sum_disc_price"),
          asDouble(sum((disc(col("l_extendedprice"), col("l_discount")) *
            (lit(1) + rate(col("l_tax")))).cast("decimal(18,6)"))).as("sum_charge"),
          (asDouble(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
          (asDouble(sum(money(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
          (asDouble(sum(rate(col("l_discount")))) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }, Some(s"""
      SELECT l_returnflag, l_linestatus,
        ${sumDec("l_quantity")} AS sum_qty,
        ${sumDec("l_extendedprice")} AS sum_base_price,
        $REV AS sum_disc_price,
        CAST(SUM(CAST($DISC * (1 + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        ${sumDec("l_quantity")} / COUNT(*) AS avg_qty,
        ${sumDec("l_extendedprice")} / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""), headline = true),

    // ------------------------------------------------------------------
    // Q2-style: cheapest supplier per small part (correlated min subquery in
    // the oracle; groupBy+join decomposition on the Spark side).
    QueryDef("q02_min_cost_supplier", (s, d) => {
      val l = t(s, d, "lineitem").withColumn("unit_price",
        col("l_extendedprice") / col("l_quantity"))
      val p = t(s, d, "part").filter(col("p_size") <= 5)
      val sup = t(s, d, "supplier")
      val minUnit = l.groupBy(col("l_partkey").as("mk"))
        .agg(min(col("unit_price")).as("min_unit"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(minUnit, l("l_partkey") === minUnit("mk") &&
          l("unit_price") === minUnit("min_unit"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          col("unit_price"))
        .distinct()
        .orderBy(col("p_partkey"), col("s_name"))
        .limit(100)
    }, Some("""
      SELECT DISTINCT p.p_partkey, p.p_name, s.s_name,
        l.l_extendedprice / l.l_quantity AS unit_price
      FROM part p, lineitem l, supplier s
      WHERE p.p_partkey = l.l_partkey AND l.l_suppkey = s.s_suppkey
        AND p.p_size <= 5
        AND l.l_extendedprice / l.l_quantity =
          (SELECT MIN(l2.l_extendedprice / l2.l_quantity)
           FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      ORDER BY p.p_partkey, s.s_name LIMIT 100""")),

    // ------------------------------------------------------------------
    QueryDef("q03_shipping_priority", (s, d) => {
      val c = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, d, "orders").filter(col("o_orderdate") < ts("1997-03-15"))
      val l = t(s, d, "lineitem").filter(col("l_shipdate") > ts("1997-03-15"))
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("l_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_orderpriority"))
        .agg(asDouble(sum(disc(col("l_extendedprice"), col("l_discount")))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"), col("o_orderdate"), col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }, Some(s"""
      SELECT l_orderkey, $REV AS revenue,
        strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
      FROM customer, orders, lineitem
      WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        AND l_orderkey = o_orderkey
        AND o_orderdate < TIMESTAMP '1997-03-15'
        AND l_shipdate > TIMESTAMP '1997-03-15'
      GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""), headline = true),

    // ------------------------------------------------------------------
    // Q4: EXISTS → left-semi join (late line: shipped after order date).
    QueryDef("q04_order_priority", (s, d) => {
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1996-04-01"))
      val l = t(s, d, "lineitem")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }, Some("""
      SELECT o_orderpriority, COUNT(*) AS order_count
      FROM orders o
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-04-01'
        AND EXISTS (SELECT 1 FROM lineitem l
                    WHERE l.l_orderkey = o.o_orderkey
                      AND l.l_shipdate > o.o_orderdate)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""")),

    // ------------------------------------------------------------------
    QueryDef("q05_local_supplier_volume", (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      val l = t(s, d, "lineitem")
      val sup = t(s, d, "supplier")
      val n = t(s, d, "nation")
      val r = t(s, d, "region").filter(col("r_name") === "ASIA")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey") &&
          c("c_nationkey") === sup("s_nationkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(asDouble(sum(disc(col("l_extendedprice"), col("l_discount")))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }, Some(s"""
      SELECT n_name, $REV AS revenue
      FROM customer, orders, lineitem, supplier, nation, region
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        AND r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""), headline = true),

    // ------------------------------------------------------------------
    QueryDef("q06_revenue_forecast", (s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01") &&
          col("l_discount") >= 0.045 && col("l_discount") <= 0.075 &&
          col("l_quantity") < 24)
        .agg(asDouble(sum((money(col("l_extendedprice")) * rate(col("l_discount")))
          .cast("decimal(18,4)"))).as("revenue"))
    }, Some("""
      SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
               CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
        AND l_discount >= 0.045 AND l_discount <= 0.075
        AND l_quantity < 24"""), headline = true),

    // ------------------------------------------------------------------
    QueryDef("q07_volume_shipping", (s, d) => {
      val sup = t(s, d, "supplier")
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") <= ts("1997-12-31"))
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      val n1 = t(s, d, "nation").select(col("n_nationkey").as("n1_key"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").select(col("n_nationkey").as("n2_key"),
        col("n_name").as("cust_nation"))
      sup.join(l, sup("s_suppkey") === l("l_suppkey"))
        .join(o, o("o_orderkey") === l("l_orderkey"))
        .join(c, c("c_custkey") === o("o_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .withColumn("l_year", year(col("l_shipdate")).cast("long"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(asDouble(sum(disc(col("l_extendedprice"), col("l_discount")))).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }, Some(s"""
      SELECT supp_nation, cust_nation, l_year, CAST(SUM(volume) AS DOUBLE) AS revenue
      FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year, $DISC AS volume
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
          AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      ) shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year""")),

    // ------------------------------------------------------------------
    // Q8-style market share of one nation within a region, per order year.
    QueryDef("q08_market_share", (s, d) => {
      val p = t(s, d, "part").filter(col("p_type") === "PROMO")
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") <= ts("1997-12-31"))
      val c = t(s, d, "customer")
      val sup = t(s, d, "supplier")
      val n1 = t(s, d, "nation").select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("cn_region"))
      val r = t(s, d, "region").filter(col("r_name") === "AMERICA")
      val zeroDec = lit(0).cast("decimal(18,4)")
      p.join(l, p("p_partkey") === l("l_partkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
        .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("cn_region") === col("r_regionkey"))
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .withColumn("volume", disc(col("l_extendedprice"), col("l_discount")))
        .groupBy(col("o_year"))
        .agg((asDouble(sum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(zeroDec))) / asDouble(sum(col("volume")))).as("mkt_share"))
        .orderBy(col("o_year"))
    }, Some(s"""
      SELECT o_year,
        CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
          / CAST(SUM(volume) AS DOUBLE) AS mkt_share
      FROM (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, $DISC AS volume,
          n1.n_name AS supp_nation
        FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey AND l_suppkey = s_suppkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r_regionkey AND r_name = 'AMERICA'
          AND p_type = 'PROMO'
          AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
      ) all_nations
      GROUP BY o_year ORDER BY o_year""")),

    // ------------------------------------------------------------------
    // Q9-style product-type profit (no partsupp: cost modeled from
    // p_retailprice), parts matching a name keyword.
    QueryDef("q09_product_profit", (s, d) => {
      val p = t(s, d, "part").filter(col("p_name").like("%red%"))
      val l = t(s, d, "lineitem")
      val o = t(s, d, "orders")
      val sup = t(s, d, "supplier")
      val n = t(s, d, "nation")
      val cost = (money(col("p_retailprice")) * dec(col("l_quantity")) *
        lit(0.5).cast("decimal(2,1)")).cast("decimal(18,4)")
      p.join(l, p("p_partkey") === l("l_partkey"))
        .join(sup, l("l_suppkey") === sup("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .withColumn("amount",
          (disc(col("l_extendedprice"), col("l_discount")) - cost).cast("decimal(18,4)"))
        .groupBy(col("n_name").as("nation"), col("o_year"))
        .agg(asDouble(sum(col("amount"))).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }, Some(s"""
      SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
      FROM (
        SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST($DISC - CAST(CAST(p_retailprice AS DECIMAL(12,2)) *
            CAST(l_quantity AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1))
            AS DECIMAL(18,4)) AS DECIMAL(18,4)) AS amount
        FROM part, lineitem, supplier, orders, nation
        WHERE p_partkey = l_partkey AND l_suppkey = s_suppkey
          AND l_orderkey = o_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%red%'
      ) profit
      GROUP BY nation, o_year ORDER BY nation, o_year DESC"""), headline = true),

    // ------------------------------------------------------------------
    QueryDef("q10_returned_items", (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
        .filter(col("o_orderdate") >= ts("1996-10-01") &&
          col("o_orderdate") < ts("1997-01-01"))
      val l = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
      val n = t(s, d, "nation")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .join(l, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"), col("c_mktsegment"))
        .agg(asDouble(sum(disc(col("l_extendedprice"), col("l_discount")))).as("revenue"))
        .select(col("c_custkey"), col("c_name"), col("revenue"), col("c_acctbal"),
          col("n_name"), col("c_mktsegment"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }, Some(s"""
      SELECT c_custkey, c_name, $REV AS revenue, c_acctbal, n_name, c_mktsegment
      FROM customer, orders, lineitem, nation
      WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
        AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
      ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // ------------------------------------------------------------------
    // Q11-style: high-value parts by lineitem revenue vs a global threshold
    // (scalar subquery → computed once and cross-joined on the Spark side).
    QueryDef("q11_important_parts", (s, d) => {
      val l = t(s, d, "lineitem")
      val perPart = l.groupBy(col("l_partkey"))
        .agg(asDouble(sum(disc(col("l_extendedprice"), col("l_discount")))).as("value"))
      val threshold = l.agg((asDouble(sum(disc(col("l_extendedprice"),
        col("l_discount")))) * lit(0.0005)).as("thr"))
      perPart.crossJoin(broadcast(threshold))
        .filter(col("value") > col("thr"))
        .select(col("l_partkey"), col("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }, Some(s"""
      SELECT l_partkey, $REV AS value
      FROM lineitem
      GROUP BY l_partkey
      HAVING $REV > (SELECT $REV * 0.0005 FROM lineitem)
      ORDER BY value DESC, l_partkey""")),

    // ------------------------------------------------------------------
    // Q12-style: late lines (shipped >60 days after order) by return flag,
    // split into high/low priority counts.
    QueryDef("q12_late_shipments", (s, d) => {
      val o = t(s, d, "orders")
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1996-01-01") &&
          col("l_shipdate") < ts("1997-01-01"))
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      o.join(l, o("o_orderkey") === l("l_orderkey") &&
          l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(
          count(when(high, lit(1))).as("high_line_count"),
          count(when(!high, lit(1))).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }, Some("""
      SELECT l_returnflag,
        COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
        COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
      FROM orders, lineitem
      WHERE o_orderkey = l_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // ------------------------------------------------------------------
    QueryDef("q13_customer_distribution", (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderpriority") =!= "5-LOW")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(o("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }, Some("""
      SELECT c_count, COUNT(*) AS custdist
      FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
        GROUP BY c.c_custkey
      ) c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""), headline = true),

    // ------------------------------------------------------------------
    QueryDef("q14_promo_effect", (s, d) => {
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-02-01"))
      val p = t(s, d, "part")
      val zeroDec = lit(0).cast("decimal(18,4)")
      l.join(p, l("l_partkey") === p("p_partkey"))
        .withColumn("volume", disc(col("l_extendedprice"), col("l_discount")))
        .agg((asDouble(sum(when(col("p_type") === "PROMO", col("volume"))
          .otherwise(zeroDec))) * lit(100) / asDouble(sum(col("volume"))))
          .as("promo_revenue"))
    }, Some(s"""
      SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN $DISC
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) * 100
             / CAST(SUM($DISC) AS DOUBLE) AS promo_revenue
      FROM lineitem, part
      WHERE l_partkey = p_partkey
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-02-01'""")),

    // ------------------------------------------------------------------
    QueryDef("q15_top_supplier", (s, d) => {
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1997-04-01"))
      val sup = t(s, d, "supplier")
      val revenue = l.groupBy(col("l_suppkey").as("supplier_no"))
        .agg(asDouble(sum(disc(col("l_extendedprice"), col("l_discount")))).as("total_revenue"))
      val maxRev = revenue.agg(max(col("total_revenue")).as("max_rev"))
      sup.join(revenue, col("s_suppkey") === col("supplier_no"))
        .crossJoin(broadcast(maxRev))
        .filter(col("total_revenue") === col("max_rev"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }, Some(s"""
      WITH revenue AS (
        SELECT l_suppkey AS supplier_no, $REV AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier, revenue
      WHERE s_suppkey = supplier_no
        AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      ORDER BY s_suppkey""")),

    // ------------------------------------------------------------------
    // Q16-style: distinct supplier count per part attribute bucket, with a
    // NOT IN subquery excluding negative-balance suppliers.
    QueryDef("q16_supplier_part_counts", (s, d) => {
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
      val badSupp = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(broadcast(badSupp), l("l_suppkey") === badSupp("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    }, Some("""
      SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
        COUNT(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand <> 'Brand#1'
        AND p_size IN (1,5,9,13,17,21,25,29)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")),

    // ------------------------------------------------------------------
    // Q17: correlated AVG subquery (small-quantity orders revenue).
    QueryDef("q17_small_quantity", (s, d) => {
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part")
        .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
      val avgQty = l.groupBy(col("l_partkey").as("ak"))
        .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      l.join(p, l("l_partkey") === p("p_partkey"))
        .join(avgQty, l("l_partkey") === avgQty("ak"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((asDouble(sum(money(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"))
    }, Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND p_brand = 'Brand#3' AND p_type = 'SMALL'
        AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                          FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""")),

    // ------------------------------------------------------------------
    QueryDef("q18_large_volume_customer", (s, d) => {
      val l = t(s, d, "lineitem")
      val bigOrders = l.groupBy(col("l_orderkey").as("bk"))
        .agg(sum(dec(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 150)
        .select(col("bk"))
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(bigOrders, o("o_orderkey") === bigOrders("bk"), "left_semi")
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(l, o("o_orderkey") === l("l_orderkey"))
        .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
          col("o_totalprice"))
        .agg(asDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }, Some("""
      SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
        o_totalprice, CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
      FROM customer, orders, lineitem
      WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
          HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150)
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      GROUP BY c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d'), o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""), headline = true),

    // ------------------------------------------------------------------
    QueryDef("q19_discounted_revenue", (s, d) => {
      val l = t(s, d, "lineitem")
      val p = t(s, d, "part")
      val cond =
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity") >= 1 && col("l_quantity") <= 11) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity") >= 10 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity") >= 20 && col("l_quantity") <= 30)
      l.join(p, l("l_partkey") === p("p_partkey"))
        .filter(cond)
        .agg(asDouble(sum(disc(col("l_extendedprice"), col("l_discount")))).as("revenue"))
    }, Some(s"""
      SELECT $REV AS revenue
      FROM lineitem, part
      WHERE p_partkey = l_partkey AND (
        (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 30))""")),

    // ------------------------------------------------------------------
    // Q20-style: suppliers that moved serious volume of 'red' parts
    // (nested IN subqueries → semi joins).
    QueryDef("q20_red_part_suppliers", (s, d) => {
      val p = t(s, d, "part").filter(col("p_name").like("red%"))
        .select(col("p_partkey"))
      val l = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= ts("1997-01-01") &&
          col("l_shipdate") < ts("1998-01-01"))
      val sup = t(s, d, "supplier")
      val qualified = l.join(broadcast(p), l("l_partkey") === p("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 50)
        .select(col("l_suppkey"))
      sup.join(qualified, sup("s_suppkey") === qualified("l_suppkey"), "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    }, Some("""
      SELECT s_name, s_acctbal
      FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50)
      ORDER BY s_name""")),

    // ------------------------------------------------------------------
    // Q21-style: suppliers whose line was the only late one on a
    // multi-supplier finished order. The EXISTS / NOT EXISTS pair is
    // evaluated as ONE per-order min/max aggregate instead of two
    // lineitem self-joins: "another supplier exists" ⟺ min(suppkey) ≠
    // max(suppkey), and "no OTHER late supplier" ⟺ the late-supplier
    // set is exactly {this supplier} ⟺ its min and max both equal
    // l_suppkey. min/max partial-aggregate map-side, so the rewrite
    // replaces two full shuffles of lineitem (semi + anti) with one
    // shuffle of per-order 4-column summaries — the shape that survives
    // a 100 TB lineitem. (Semi/anti planning itself stays exercised and
    // plan-pinned by q04/q20/q22.)
    QueryDef("q21_waiting_suppliers", (s, d) => {
      val sup = t(s, d, "supplier")
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val o = t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderstatus"))
      val joined = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      val perOrder = joined.groupBy(col("l_orderkey").as("agg_orderkey"))
        .agg(min(col("l_suppkey")).as("min_supp"),
          max(col("l_suppkey")).as("max_supp"),
          min(when(col("is_late"), col("l_suppkey"))).as("min_late"),
          max(when(col("is_late"), col("l_suppkey"))).as("max_late"))
      joined.filter(col("o_orderstatus") === "F" && col("is_late"))
        .join(perOrder, col("l_orderkey") === col("agg_orderkey"))
        .filter(col("min_supp") =!= col("max_supp") &&
          col("min_late") === col("l_suppkey") &&
          col("max_late") === col("l_suppkey"))
        .join(sup, col("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }, Some("""
      SELECT s_name, COUNT(*) AS numwait
      FROM supplier, lineitem l1, orders
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3, orders o3
                        WHERE o3.o_orderkey = l3.l_orderkey
                          AND l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o3.o_orderdate + INTERVAL 30 DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""), headline = true),

    // ------------------------------------------------------------------
    // Q22-style: rich customers with no orders, bucketed by a name-derived
    // country code (scalar AVG subquery + NOT EXISTS anti join).
    QueryDef("q22_global_sales_opportunity", (s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      val thr = c.filter(col("c_acctbal") > 0.0)
        .agg((asDouble(sum(money(col("c_acctbal")))) / count(lit(1))).as("thr"))
      c.crossJoin(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .withColumn("cntrycode", substring(col("c_name"), 15, 2))
        .groupBy(col("cntrycode"))
        .agg(count(lit(1)).as("numcust"),
          asDouble(sum(money(col("c_acctbal")))).as("totacctbal"))
        .orderBy(col("cntrycode"))
    }, Some("""
      SELECT cntrycode, COUNT(*) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      FROM (
        SELECT SUBSTRING(c_name, 15, 2) AS cntrycode, c_acctbal
        FROM customer c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
      ) custsale
      GROUP BY cntrycode ORDER BY cntrycode"""))
  )
}
