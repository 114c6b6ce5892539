package graft

object SimilarityQueries {
  def all: Seq[QueryDef] = Seq()
}
