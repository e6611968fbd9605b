package graft

/** Central registry: every implemented operator family registers its
  * driver-visible queries here (VERDICT.md round-1 fix: SparkEntry derives
  * its `queries`/`oracleSql` maps mechanically from this Seq). */
object Queries {
  val all: Seq[Q] =
    graft.queries.Relational.all ++
    graft.queries.AnimeQueries.all ++
    graft.queries.BucketQueries.all ++
    graft.queries.LlmQueries.all ++
    graft.queries.PipelineQueries.all ++
    graft.queries.MultimodalQueries.all ++
    graft.queries.SourceQueries.all ++
    graft.queries.SearchQueries.all ++
    graft.queries.CurationQueries.all ++
    graft.queries.PqQueries.all ++
    graft.queries.TopicQueries.all ++
    graft.queries.ReleaseQueries.all ++
    graft.queries.LmQueries.all ++
    graft.queries.GraphQueries.all ++
    graft.queries.SuffixQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
