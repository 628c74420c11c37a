package graft.queries

/** All verifiable queries, across suites. SparkEntry derives its driver
  * contract maps from this list.
  */
object Registry {
  def all: Seq[QueryDef] =
    Tpch.queries ++ Analytics.queries ++ PipelineQueries.queries ++
      MetaQueries.queries ++ SourceQueries.queries

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
