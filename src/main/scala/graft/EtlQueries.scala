package graft

object EtlQueries {
  def all: Seq[QueryDef] = Seq()
}
