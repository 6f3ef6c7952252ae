package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.MisraGries

/** Streaming trending-token tracking with BOUNDED state — the streaming
  * twin of [[graft.operators.HeavyHitters]]: a per-token streaming
  * aggregation's state grows with the vocabulary (unbounded on raw text);
  * here tokens hash into `groups` coarse groups and each group's state is
  * ONE [[MisraGries]] sketch, so total state is ≤ groups · k (token,
  * count) pairs however many distinct tokens the stream ever carries.
  *
  * Per group the MG guarantee holds across batches (`reduce` is the same
  * fold batch-by-batch): any token with in-group frequency > N_g/(k+1) is
  * tracked, undercounted by at most N_g/(k+1). Groups are
  * `floorMod(token.hashCode, groups)` — String.hashCode is specified, so
  * group routing is stable across JVMs and retries.
  */
object StreamingHeavyHitters {

  final case class TokenEst(group: Int, tok: String, est: Long)

  /** Update-mode tracker: each trigger re-emits the touched groups'
    * current sketch entries (≤ k rows per group). */
  def track(tokens: Dataset[String], groups: Int, k: Int): Dataset[TokenEst] = {
    val spark = tokens.sparkSession
    import spark.implicits._
    val mg = new MisraGries(k)
    tokens
      // null tokens would NPE in the group router and become null map
      // keys in the sketch state (rejected by the map encoder) — drop
      // them before any state is touched
      .filter((t: String) => t != null)
      .groupByKey(t => math.floorMod(t.hashCode, groups))
      .flatMapGroupsWithState[Map[String, Long], TokenEst](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (g: Int, toks: Iterator[String], state) =>
          val cur = toks.foldLeft(state.getOption.getOrElse(mg.zero))(mg.reduce)
          state.update(cur)
          cur.iterator.map { case (t, c) => TokenEst(g, t, c) }
      }
  }
}
