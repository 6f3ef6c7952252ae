package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Graph analytics over edge lists derived from event streams (⊕ beyond
  * reference parity — the reference has no graph surface; this family
  * serves the "what content leads to what" questions a training-data
  * pipeline asks of its crawl/interaction logs).
  *
  * Design notes for 100 TB:
  *   - The raw event volume never reaches the iterative stage: edges
  *     aggregate to ≤ |items|² weighted rows and ranks to |items| rows,
  *     so iteration cost is graph-sized, not log-sized.
  *   - PageRank runs in EXACT scaled-integer arithmetic (fixed-point
  *     longs, floor division over positives). Distributed summation
  *     order can therefore never perturb a single bit — two runs are
  *     byte-comparable, and the unrolled-CTE oracle matches hash-for-hash
  *     (the same determinism discipline as the rest of the inventory).
  *   - Co-occurrence folds each user's items into ONE capped array
  *     instead of self-joining the (user, item) stream — the classic
  *     quadratic-on-bot-users blowup is bounded by `maxItemsPerUser`.
  */
object Graph {

  /** Per-user consecutive-item transition edges `(src, dst, cnt)`.
    * One window shuffle on `userCol` (ordered by `tsCol`, tie-broken by
    * `tieCol` so the edge list is deterministic under equal timestamps),
    * then a partial-aggregated count.
    */
  def transitionEdges(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      tieCol: String,
      itemCol: String): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    events
      .filter(col(itemCol).isNotNull)
      .select(col(userCol), col(itemCol), lag(col(itemCol), 1).over(w).as("__prev"))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("src"), col(itemCol).as("dst"))
      .agg(count(lit(1)).cast(LongType).as("cnt"))
  }

  /** Weighted PageRank over `(src, dst, cnt)` edges: `iterations`
    * driver-coordinated rounds at damping 0.85 in exact fixed-point
    * arithmetic (`scale` = one unit of rank mass):
    *
    *   r₀ = scale DIV N
    *   rₖ₊₁(t) = (15·scale) DIV (100·N)  +  (85 · Σ_{s→t} rₖ(s)·cnt DIV out(s)) DIV 100
    *
    * Every division is a floor over positives, so Spark's `DIV` and
    * DuckDB's `//` agree exactly. Dangling mass (nodes without
    * out-edges) leaks, as in the simplified formulation — stated
    * semantics, identical on both sides.
    *
    * Shape per round: ranks ⋈ edges on src (AQE broadcasts the rank side
    * when the node set is small), partial-agg sum on dst, left join back
    * to the node set. `nodes` must have a single `node` column. For deep
    * iteration counts, truncate lineage as `Dedup.connectedComponents`
    * does; the typical 3–20 rounds here don't need it.
    */
  def pageRank(
      nodes: DataFrame,
      edges: DataFrame,
      iterations: Int,
      scale: Long = 1000000000000L): DataFrame = {
    val n = nodes.count() // scalar driver action over the tiny node set
    require(n > 0, "pageRank needs a non-empty node set")
    val seeded = nodes.select(col("node"),
      lit(scale / n).as("__r0"),
      lit((15L * scale) / (100L * n)).as("__tele"))
    prIterate(seeded, edges, iterations)
  }

  /** Personalized (topic-sensitive) PageRank: teleport mass returns only
    * to `seeds` (single `node` column) instead of uniformly — the
    * trust-propagation / recommendation variant. Same exact fixed-point
    * recurrence with
    *   r₀(t) = scale DIV |S| for t ∈ S, else 0
    *   teleport(t) = (15·scale) DIV (100·|S|) for t ∈ S, else 0.
    */
  def personalizedPageRank(
      nodes: DataFrame,
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int,
      scale: Long = 1000000000000L): DataFrame = {
    val nSeeds = seeds.count()
    require(nSeeds > 0, "personalizedPageRank needs a non-empty seed set")
    val seeded = nodes
      .join(seeds.select(col("node"), lit(true).as("__seed")), Seq("node"), "left")
      .select(col("node"),
        when(col("__seed"), lit(scale / nSeeds)).otherwise(lit(0L)).as("__r0"),
        when(col("__seed"), lit((15L * scale) / (100L * nSeeds)))
          .otherwise(lit(0L)).as("__tele"))
    prIterate(seeded, edges, iterations)
  }

  /** The shared rank iteration over `(node, __r0, __tele)`: per round,
    * ranks ⋈ edges on src, partial-agg sum on dst, left join back. */
  private def prIterate(
      seeded: DataFrame,
      edges: DataFrame,
      iterations: Int): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val out = edges.groupBy("src").agg(sum(col("cnt")).cast(LongType).as("out_cnt"))
    val e = edges.join(out, "src")
    var ranks = seeded.select(col("node"), col("__r0").as("pr"))
    for (_ <- 1 to iterations) {
      val sums = e
        .join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("(pr * cnt) DIV out_cnt").as("contrib"))
        .groupBy("dst")
        .agg(sum(col("contrib")).cast(LongType).as("s"))
      ranks = seeded
        .join(sums, seeded("node") === sums("dst"), "left")
        .select(seeded("node"),
          (col("__tele") + expr("(85 * coalesce(s, 0L)) DIV 100"))
            .cast(LongType).as("pr"))
    }
    ranks
  }

  /** Unordered item co-occurrence: for each item pair, the number of
    * users who touched both. The naive form — self-joining the distinct
    * `(user, item)` stream on user — shuffles a pair stream that grows
    * quadratically on heavy users. This fold instead groups each user's
    * DISTINCT items into one sorted array capped at `maxItemsPerUser`
    * (one shuffle, bounded per-key state), expands pairs MAP-SIDE with
    * array HOFs, and partial-aggregates the counts. With the cap at or
    * above the true per-user distinct count the result is exactly the
    * self-join semantics (the gate runs it that way); below it, the
    * kept items are the smallest by sort order — a deterministic,
    * documented truncation.
    */
  def cooccurrence(
      df: DataFrame,
      userCol: String,
      itemCol: String,
      maxItemsPerUser: Int): DataFrame = {
    require(maxItemsPerUser >= 2, s"maxItemsPerUser must be >= 2, got $maxItemsPerUser")
    df.select(col(userCol).as("user"), col(itemCol).as("item"))
      .filter(col("user").isNotNull && col("item").isNotNull)
      .distinct()
      .groupBy("user")
      .agg(slice(sort_array(collect_set(col("item"))), 1, maxItemsPerUser).as("items"))
      .select(explode(expr(
        """flatten(transform(items, (x, i) ->
          |  transform(slice(items, i + 2, size(items) - i - 1),
          |            y -> struct(x AS item_a, y AS item_b))))""".stripMargin)).as("p"))
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).cast(LongType).as("n_users"))
  }
}
