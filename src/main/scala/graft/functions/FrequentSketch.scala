package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch as a typed aggregate: at most `k`
  * counters regardless of how many distinct keys stream through — the
  * bounded-memory alternative to a full `groupBy(key).count()` whose
  * per-task hash map must otherwise hold EVERY distinct key (at 100 TB of
  * text, billions of tokens; a hard OOM, not a slowdown).
  *
  * Guarantees (Misra & Gries 1982; mergeability per Agarwal et al. 2012,
  * "Mergeable Summaries"):
  *   - every item with true frequency > N/(k+1) is present in the sketch;
  *   - counts are underestimates by at most N/(k+1);
  *   - merging two sketches preserves both bounds for the combined stream
  *     (merge = sum counters, then subtract the (k+1)-th largest and drop
  *     non-positive — the same decrement step as the streaming update).
  *
  * The buffer is an immutable Map (encoded as a SQL map — no kryo): the
  * JVM object lives across `reduce` calls within a partition, so the
  * rebuild cost on decrement is O(k) amortized over ≥ k arrivals. A
  * production buffer would be flat sorted arrays like [[MinHashSketch]]'s;
  * the SEMANTICS gated here are identical.
  */
class MisraGries(val k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {

  require(k >= 1, s"need at least one counter, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], tok: String): Map[String, Long] =
    buf.get(tok) match {
      case Some(c) => buf.updated(tok, c + 1L)
      case None if buf.size < k => buf.updated(tok, 1L)
      case None => // decrement-all; drop exhausted counters
        buf.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      // subtract the (k+1)-th largest count from everything, keep > 0 —
      // at most k survivors, and the MG undercount bound composes
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.view.mapValues(_ - cut).filter(_._2 > 0L).toMap
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
