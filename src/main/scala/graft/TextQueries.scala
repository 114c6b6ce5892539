package graft

object TextQueries {
  def all: Seq[QueryDef] = Seq()
}
