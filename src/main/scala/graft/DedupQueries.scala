package graft

object DedupQueries {
  def all: Seq[QueryDef] = Seq()
}
