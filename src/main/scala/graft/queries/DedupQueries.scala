package graft.queries

import graft.GQuery

/** Placeholder — populated as SURVEY.md §2 coverage widens. */
object DedupQueries {
  val all: Seq[GQuery] = Seq.empty
}
