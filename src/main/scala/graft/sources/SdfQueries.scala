package graft.sources

import graft.GraftQuery

object SdfQueries {
  def queries: Seq[GraftQuery] = Seq.empty
}
