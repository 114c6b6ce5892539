package graft

object StreamQueries {
  def all: Seq[QueryDef] = Seq()
}
