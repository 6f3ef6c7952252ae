package graft.queries

/** Text-analysis inventory (LLM-pipeline extension) — filled in
  * incrementally; see graft.functions.TextFunctions. */
object TextOps {
  val entries: Seq[Entry] = Seq()
}
