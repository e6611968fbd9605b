package graft.queries

import graft.Q

/** LLM-training-data pipeline queries (filled in slice 3). */
object LlmQueries {
  val all: Seq[Q] = Seq()
}
