// sbt "runMain graft.Smoke" — driver-style smoke: entry() on sf0.001 rows>0.
package graft
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"SMOKE entry rows=${rows.length}")
    rows.take(5).foreach(r => println(s"SMOKE row: $r"))
    spark.stop()
  }
}
