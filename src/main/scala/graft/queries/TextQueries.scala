package graft.queries

import graft.GQuery

/** Placeholder — populated as SURVEY.md §2 coverage widens. */
object TextQueries {
  val all: Seq[GQuery] = Seq.empty
}
