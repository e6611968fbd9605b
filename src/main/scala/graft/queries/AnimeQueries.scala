package graft.queries

import graft.Q

/** Anime-pipeline operator queries (filled in slice 2). */
object AnimeQueries {
  val all: Seq[Q] = Seq()
}
