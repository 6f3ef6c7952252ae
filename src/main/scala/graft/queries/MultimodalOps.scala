package graft.queries

/** Multimodal (binary column) inventory — see graft.operators.Multimodal. */
object MultimodalOps {
  val entries: Seq[Entry] = Seq()
}
