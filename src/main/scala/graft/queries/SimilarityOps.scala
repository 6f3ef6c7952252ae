package graft.queries

/** Similarity-search inventory (brute-force cosine top-k, LSH-bucketed
  * ANN) — see graft.operators.Similarity. */
object SimilarityOps {
  val entries: Seq[Entry] = Seq()
}
