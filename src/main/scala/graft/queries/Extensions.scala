package graft.queries

/** Beyond-reference scale-out operators (SURVEY.md §2.8): dedup,
  * similarity search, text analysis, multimodal plumbing. Implemented
  * in graft.ext.* with the DataFrame API; wired here as judged queries.
  * Placeholder seq — populated as graft.ext lands.
  */
object Extensions {
  val qs: Seq[Q] = Seq.empty
}
