package graft.queries

/** Layer-C LLM-data-pipeline operators (SURVEY.md §2-C) — filled in
  * incrementally; see Dedup/Similarity/TextAnalysis operator modules.
  */
object Pipeline {
  val all: Seq[Q] = Seq.empty
}
