package graft.queries

/** North-star extension operators (SURVEY.md §7.5): dedup, similarity
  * search, text analysis, multimodal. Filled in as each ext/ module lands.
  */
object ExtensionQueries {
  val all: Seq[Q] = Seq()
}
