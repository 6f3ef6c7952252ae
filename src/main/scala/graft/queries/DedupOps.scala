package graft.queries

/** Deduplication inventory (exact, MinHash-LSH, SimHash, n-gram Jaccard,
  * embedding near-dup) — see graft.operators.Dedup. */
object DedupOps {
  val entries: Seq[Entry] = Seq()
}
