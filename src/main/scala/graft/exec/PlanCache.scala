package graft.exec

import java.util.UUID

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
  *
  * BOUNDED, unlike the reference's bare maps (`service.rs:65,186`): a
  * long-running server serving clients that never `/close` would otherwise
  * leak analyzed plans without limit. Two independent bounds, both config
  * knobs on the constructor:
  *
  *  - `maxEntries`: LRU cap — preparing the (maxEntries+1)-th plan evicts
  *    the least-recently-USED handle (execute refreshes recency, matching
  *    how a client keeps a statement alive by using it);
  *  - `ttlMillis`: handles idle longer than this are dropped lazily at the
  *    next prepare/execute (no reaper thread — a handful of stale
  *    DataFrames holds no executor resources, only driver references).
  *
  * An evicted handle behaves exactly like an unknown one: "no plan found",
  * the reference's error for a ticket it no longer holds.
  */
class PlanCache(ctx: ExecutionContext,
    maxEntries: Int = 256,
    ttlMillis: Long = 30L * 60 * 1000,
    clock: () => Long = () => System.currentTimeMillis()) {
  require(maxEntries > 0, "maxEntries must be positive")
  require(ttlMillis > 0, "ttlMillis must be positive")

  final case class Prepared(handle: String, schema: StructType)

  private final case class Entry(df: DataFrame, var lastUsed: Long)

  // access-ordered LinkedHashMap: iteration order = least-recently-used
  // first, so the eviction scan below touches only what it removes
  private val plans =
    new java.util.LinkedHashMap[String, Entry](16, 0.75f, true)

  private def evictStale(now: Long): Unit = plans.synchronized {
    val it = plans.values().iterator()
    // LRU order ⇒ once one survivor is seen, later entries are fresher
    var done = false
    while (!done && it.hasNext) {
      if (now - it.next().lastUsed > ttlMillis) it.remove() else done = true
    }
  }

  /** Plan the SQL, store it under a fresh handle, return handle + schema
    * (the reference returns FlightInfo{schema, ticket=uuid}).
    */
  def prepare(sql: String): Prepared = {
    val df = ctx.sql(sql)
    val schema = df.schema // forces analysis; errors surface here, not at execute
    val handle = UUID.randomUUID().toString
    val now = clock()
    plans.synchronized {
      evictStale(now)
      // LRU cap: make room for the incoming handle
      while (plans.size() >= maxEntries) {
        val lru = plans.keySet().iterator()
        lru.next(); lru.remove()
      }
      plans.put(handle, Entry(df, now))
    }
    Prepared(handle, schema)
  }

  /** Execute a stored plan (reference DoGet). Unknown — or evicted —
    * handles error like the reference's "no plan found for handle".
    */
  def execute(handle: String): DataFrame = {
    val now = clock()
    plans.synchronized {
      evictStale(now)
      val e = plans.get(handle)
      if (e == null)
        throw new NoSuchElementException(s"no plan found for handle $handle")
      e.lastUsed = now
      e.df
    }
  }

  /** Drop a stored plan (reference ActionClosePreparedStatementRequest). */
  def close(handle: String): Boolean =
    plans.synchronized(plans.remove(handle) != null)

  def size: Int = plans.synchronized(plans.size())
}
