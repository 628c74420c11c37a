package graft.tables

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Row-keyed map table (reference
  * `crates/datafusion-app/src/tables/map_table.rs:46-167`): primary-key-keyed,
  * insertion-ordered rows held in memory, scanned as a columnar DataFrame.
  * The reference's custom MapExec leaf is unnecessary on Spark — a
  * LocalRelation from `createDataFrame` gives Catalyst the same scan with
  * projection/filter/limit pushdown for free. PK lookups stay map-speed at
  * the app level via [[get]].
  */
class MapTable(spark: SparkSession, val name: String, val schema: StructType,
    pkField: String) {

  private val pkIndex = schema.fieldIndex(pkField)
  private val rows = mutable.LinkedHashMap.empty[Any, Row]

  def insert(row: Row): Unit = synchronized {
    require(row.length == schema.length, s"row arity ${row.length} != schema ${schema.length}")
    rows.put(row.get(pkIndex), row)
    register()
  }

  def insertAll(rs: Seq[Row]): Unit = synchronized {
    rs.foreach(r => rows.put(r.get(pkIndex), r))
    register()
  }

  def delete(pk: Any): Boolean = synchronized {
    val removed = rows.remove(pk).isDefined
    if (removed) register()
    removed
  }

  /** O(1) primary-key lookup (app-level; no Spark job). */
  def get(pk: Any): Option[Row] = synchronized(rows.get(pk))

  def size: Int = synchronized(rows.size)

  def toDF: DataFrame = synchronized {
    spark.createDataFrame(spark.sparkContext.parallelize(rows.values.toSeq, 1), schema)
  }

  def register(): Unit = toDF.createOrReplaceTempView(name)
}
