package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic TPC-H data generator (`generate-tpch` parity — reference
  * `src/tpch.rs:201-339` generates the 8-table schema at a scale factor
  * into the db dir; here the generation itself is reproduced rather than
  * shelling out to a dbgen).
  *
  * Design: every column is a pure function of the row's primary key via
  * `xxhash64(key, field-tag)`, evaluated inside whole-stage codegen over
  * `spark.range(n)` — no RNG state, no driver-side loops, no shuffles.
  * That makes generation distributed (range splits across executors),
  * reproducible across runs AND cluster sizes (values don't depend on
  * partitioning), and restartable. Generating 100 TB is embarrassingly
  * parallel: `range` scales to any partition count and every executor
  * computes its slice independently.
  *
  * This is not byte-for-byte dbgen output (dbgen's text distributions are
  * a spec appendix of word lists); the contract is the standard 8-table
  * SCHEMA, the SF-scaled ROW COUNTS, and FK CLOSURE (every foreign key
  * resolves), which AppSurfaceSpec checks. Cardinalities follow the spec:
  * region 5, nation 25, supplier 10k/SF, customer 150k/SF, part 200k/SF,
  * partsupp 4 rows per part (distinct suppliers via the dbgen permutation
  * formula), orders 10 per customer, lineitem 1-7 per order.
  */
object TpchDataGen {

  private def h(key: Column, tag: String): Column = xxhash64(key, lit(tag))

  /** Uniform pick in [0, n) keyed on `key` + `tag`. */
  private def pick(key: Column, tag: String, n: Int): Column =
    pmod(h(key, tag), lit(n.toLong))

  private def pickFrom(key: Column, tag: String, values: Seq[String]): Column =
    element_at(typedlit(values), (pick(key, tag, values.size) + 1).cast("int"))

  /** Money value in [lo, hi] with cents precision. */
  private def money(key: Column, tag: String, lo: Double, hi: Double): Column =
    (lit(lo) + pmod(h(key, tag), lit(((hi - lo) * 100).toLong + 1L)) / 100.0)
      .cast("decimal(15,2)")

  private def text(key: Column, tag: String): Column =
    md5(concat(key.cast("string"), lit(tag)))

  private val regionNames =
    Seq("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val nationNames = Seq(
    "ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT", "ETHIOPIA",
    "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN", "IRAQ", "JAPAN",
    "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE", "PERU", "CHINA", "ROMANIA",
    "SAUDI ARABIA", "VIETNAM", "RUSSIA", "UNITED KINGDOM", "UNITED STATES")
  // nation -> region assignment per the TPC-H spec's nation table
  private val nationRegion =
    Seq(0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0, 0, 0, 1, 2, 3, 4, 2, 3, 3, 1)

  def counts(sf: Double): Map[String, Long] = {
    val supplier = math.max(1L, (10000 * sf).toLong)
    val customer = math.max(1L, (150000 * sf).toLong)
    val part = math.max(1L, (200000 * sf).toLong)
    Map(
      "region" -> 5L, "nation" -> 25L, "supplier" -> supplier,
      "customer" -> customer, "part" -> part, "partsupp" -> part * 4,
      "orders" -> customer * 10)
  }

  def region(spark: SparkSession): DataFrame =
    spark.range(5).select(
      col("id").as("r_regionkey"),
      element_at(typedlit(regionNames), (col("id") + 1).cast("int")).as("r_name"),
      text(col("id"), "rcmt").as("r_comment"))

  def nation(spark: SparkSession): DataFrame =
    spark.range(25).select(
      col("id").as("n_nationkey"),
      element_at(typedlit(nationNames), (col("id") + 1).cast("int")).as("n_name"),
      element_at(typedlit(nationRegion.map(_.toLong)), (col("id") + 1).cast("int"))
        .as("n_regionkey"),
      text(col("id"), "ncmt").as("n_comment"))

  def supplier(spark: SparkSession, sf: Double): DataFrame = {
    val k = col("id") + 1
    spark.range(counts(sf)("supplier")).select(
      k.as("s_suppkey"),
      format_string("Supplier#%09d", k).as("s_name"),
      text(k, "saddr").as("s_address"),
      pick(k, "snat", 25).as("s_nationkey"),
      format_string("%02d-%03d-%03d-%04d", pick(k, "sp1", 25) + 10,
        pick(k, "sp2", 1000), pick(k, "sp3", 1000), pick(k, "sp4", 10000))
        .as("s_phone"),
      money(k, "sbal", -999.99, 9999.99).as("s_acctbal"),
      text(k, "scmt").as("s_comment"))
  }

  def customer(spark: SparkSession, sf: Double): DataFrame = {
    val k = col("id") + 1
    spark.range(counts(sf)("customer")).select(
      k.as("c_custkey"),
      format_string("Customer#%09d", k).as("c_name"),
      text(k, "caddr").as("c_address"),
      pick(k, "cnat", 25).as("c_nationkey"),
      format_string("%02d-%03d-%03d-%04d", pick(k, "cp1", 25) + 10,
        pick(k, "cp2", 1000), pick(k, "cp3", 1000), pick(k, "cp4", 10000))
        .as("c_phone"),
      money(k, "cbal", -999.99, 9999.99).as("c_acctbal"),
      pickFrom(k, "cseg",
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"))
        .as("c_mktsegment"),
      text(k, "ccmt").as("c_comment"))
  }

  def part(spark: SparkSession, sf: Double): DataFrame = {
    val k = col("id") + 1
    spark.range(counts(sf)("part")).select(
      k.as("p_partkey"),
      concat_ws(" ", pickFrom(k, "pn1", Seq("almond", "antique", "aquamarine",
          "azure", "beige", "bisque", "black", "blanched")),
        pickFrom(k, "pn2", Seq("lace", "lemon", "light", "lime", "linen")))
        .as("p_name"),
      format_string("Manufacturer#%d", pick(k, "pmfg", 5) + 1).as("p_mfgr"),
      format_string("Brand#%d%d", pick(k, "pmfg", 5) + 1, pick(k, "pbrd", 5) + 1)
        .as("p_brand"),
      concat_ws(" ",
        pickFrom(k, "pt1", Seq("STANDARD", "SMALL", "MEDIUM", "LARGE",
          "ECONOMY", "PROMO")),
        pickFrom(k, "pt2", Seq("ANODIZED", "BURNISHED", "PLATED", "POLISHED",
          "BRUSHED")),
        pickFrom(k, "pt3", Seq("TIN", "NICKEL", "BRASS", "STEEL", "COPPER")))
        .as("p_type"),
      (pick(k, "psz", 50) + 1).cast("int").as("p_size"),
      concat_ws(" ",
        pickFrom(k, "pc1", Seq("SM", "LG", "MED", "JUMBO", "WRAP")),
        pickFrom(k, "pc2", Seq("CASE", "BOX", "BAG", "JAR", "PKG", "PACK",
          "CAN", "DRUM")))
        .as("p_container"),
      // spec formula: (90000 + ((partkey/10) % 20001) + 100 * (partkey % 1000)) / 100
      ((lit(90000) + pmod(floor(k / 10).cast("long"), lit(20001L))
        + lit(100) * pmod(k, lit(1000L))) / 100.0)
        .cast("decimal(15,2)").as("p_retailprice"),
      text(k, "pcmt").as("p_comment"))
  }

  /** 4 supplier rows per part, distinct per part so (ps_partkey,
    * ps_suppkey) is a real PK. dbgen's permutation
    * `(partkey + i*(S/4 + (partkey-1)/S)) % S` collides for small S
    * (whenever the step hits a multiple of S/2), so the step here is a
    * per-part hash bounded to [1, S/4]: the offsets i*step for i=0..3 are
    * then distinct values below S, making the 4 suppliers distinct for any
    * S >= 4.
    */
  def partsupp(spark: SparkSession, sf: Double): DataFrame = {
    val s = counts(sf)("supplier")
    // Column./ is floating division: integer-divide via floor+cast
    val pk = floor(col("id") / 4).cast("long") + 1
    val i = pmod(col("id"), lit(4L))
    val step = pick(pk, "psstep", math.max(1L, s / 4).toInt) + 1
    val suppkey = pmod(pk + i * step, lit(s)) + 1
    spark.range(counts(sf)("partsupp")).select(
      pk.as("ps_partkey"),
      suppkey.as("ps_suppkey"),
      (pick(col("id") + 1, "psq", 9999) + 1).cast("int").as("ps_availqty"),
      money(col("id") + 1, "pss", 1.00, 1000.00).as("ps_supplycost"),
      text(col("id") + 1, "pscmt").as("ps_comment"))
  }

  def orders(spark: SparkSession, sf: Double): DataFrame = {
    val k = col("id") + 1
    val custCount = counts(sf)("customer")
    spark.range(counts(sf)("orders")).select(
      k.as("o_orderkey"),
      (pick(k, "ocust", custCount.toInt) + 1).as("o_custkey"),
      orderStatus(k).as("o_orderstatus"),
      money(k, "oprice", 857.71, 555285.16).as("o_totalprice"),
      orderDate(k).as("o_orderdate"),
      pickFrom(k, "oprio", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority"),
      format_string("Clerk#%09d", pick(k, "oclk", 1000) + 1).as("o_clerk"),
      lit(0).as("o_shippriority"),
      text(k, "ocmt").as("o_comment"))
  }

  // order date: uniform over the spec's [1992-01-01, 1998-08-02] window;
  // derived from the orderkey alone so lineitem can recompute it without a
  // join against orders
  private def orderDate(okey: Column): Column =
    date_add(to_date(lit("1992-01-01")), pick(okey, "odate", 2406).cast("int"))

  private def orderStatus(okey: Column): Column =
    when(pick(okey, "ostat", 4) === 0, "F")
      .when(pick(okey, "ostat", 4) === 1, "O")
      .otherwise("P")

  /** 1-7 lines per order. The per-order line count and every line column
    * derive from (orderkey, linenumber), so the table is generated from a
    * single `range` over orders with a `sequence` explode — narrow, no
    * join back to orders even for date columns that depend on o_orderdate.
    */
  def lineitem(spark: SparkSession, sf: Double): DataFrame = {
    val okey = col("o") + 1
    val partCount = counts(sf)("part")
    val suppCount = counts(sf)("supplier")
    val base = spark.range(counts(sf)("orders")).select(col("id").as("o"))
      .select(okey.as("l_orderkey"),
        explode(sequence(lit(1),
          (pick(okey, "lcnt", 7) + 1).cast("int"))).as("l_linenumber"))
    val lk = concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"))
    val ship = date_add(orderDate(col("l_orderkey")),
      (pick(lk, "lship", 121) + 1).cast("int"))
    base.select(
      col("l_orderkey"),
      (pick(lk, "lpart", partCount.toInt) + 1).as("l_partkey"),
      (pick(lk, "lsupp", suppCount.toInt) + 1).as("l_suppkey"),
      col("l_linenumber"),
      (pick(lk, "lqty", 50) + 1).cast("decimal(15,2)").as("l_quantity"),
      money(lk, "lext", 900.00, 104950.00).as("l_extendedprice"),
      (pick(lk, "ldisc", 11) / 100.0).cast("decimal(15,2)").as("l_discount"),
      (pick(lk, "ltax", 9) / 100.0).cast("decimal(15,2)").as("l_tax"),
      pickFrom(lk, "lrf", Seq("R", "A", "N")).as("l_returnflag"),
      when(ship <= to_date(lit("1995-06-17")), "F").otherwise("O")
        .as("l_linestatus"),
      ship.as("l_shipdate"),
      date_add(orderDate(col("l_orderkey")), (pick(lk, "lcom", 61) + 30).cast("int"))
        .as("l_commitdate"),
      date_add(ship, (pick(lk, "lrcv", 30) + 1).cast("int")).as("l_receiptdate"),
      pickFrom(lk, "lsi", Seq("DELIVER IN PERSON", "COLLECT COD", "NONE",
        "TAKE BACK RETURN")).as("l_shipinstruct"),
      pickFrom(lk, "lsm", Seq("TRUCK", "MAIL", "SHIP", "AIR", "FOB", "RAIL",
        "REG AIR")).as("l_shipmode"),
      text(lk, "lcmt").as("l_comment"))
  }

  val generators: Map[String, (SparkSession, Double) => DataFrame] = Map(
    "region" -> ((s, _) => region(s)),
    "nation" -> ((s, _) => nation(s)),
    "supplier" -> (supplier(_, _)),
    "customer" -> (customer(_, _)),
    "part" -> (part(_, _)),
    "partsupp" -> (partsupp(_, _)),
    "orders" -> (orders(_, _)),
    "lineitem" -> (lineitem(_, _)))

  /** Generate all 8 tables at `sf` into the reference's db-dir layout
    * (`dbDir/tables/<catalog>/tpch/<table>/`), like `src/tpch.rs:214-230`.
    */
  def generate(spark: SparkSession, sf: Double, dbDir: String,
      catalog: String = "dft"): Seq[String] = {
    TpchGen.tpchTables.foreach { t =>
      generators(t)(spark, sf).write.mode("overwrite")
        .parquet(s"$dbDir/tables/$catalog/tpch/$t")
    }
    TpchGen.tpchTables
  }
}
