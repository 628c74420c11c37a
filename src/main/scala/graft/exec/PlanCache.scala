package graft.exec

import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructType

/** Plan-once / execute-later contract of the reference's FlightSQL server
  * (`src/server/flightsql/service.rs:486-560`: get_flight_info plans the SQL
  * and stores the LogicalPlan under a UUID ticket; DoGet looks the plan up
  * and executes it) and its prepared statements (`service.rs:563-714` —
  * create/close, no parameter binding in the reference).
  *
  * Spark analog: cache the analyzed DataFrame. Analysis (parse + resolve)
  * happens at [[prepare]]; optimization and physical planning run lazily at
  * [[execute]], matching the reference's split where DoGet performs
  * optimize + execute on the stored logical plan.
  */
class PlanCache(ctx: ExecutionContext) {

  final case class Prepared(handle: String, schema: StructType)

  private val plans = TrieMap.empty[String, DataFrame]

  /** Plan the SQL, store it under a fresh handle, return handle + schema
    * (the reference returns FlightInfo{schema, ticket=uuid}).
    */
  def prepare(sql: String): Prepared = {
    val df = ctx.sql(sql)
    val schema = df.schema // forces analysis; errors surface here, not at execute
    val handle = UUID.randomUUID().toString
    plans.put(handle, df)
    Prepared(handle, schema)
  }

  /** Execute a stored plan (reference DoGet). Unknown handles error like the
    * reference's "no plan found for handle".
    */
  def execute(handle: String): DataFrame =
    plans.getOrElse(handle,
      throw new NoSuchElementException(s"no plan found for handle $handle"))

  /** Drop a stored plan (reference ActionClosePreparedStatementRequest). */
  def close(handle: String): Boolean = plans.remove(handle).isDefined

  def size: Int = plans.size
}
