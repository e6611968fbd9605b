package graft.queries

import graft.Q

/** End-to-end reference-pipeline queries incl. no-oracle stubs (slice 4). */
object PipelineQueries {
  val all: Seq[Q] = Seq()
}
