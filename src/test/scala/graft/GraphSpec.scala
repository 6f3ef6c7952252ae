package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph family: transition edges, exact fixed-point PageRank (checked
  * against a single-threaded replay of the same recurrence), and capped
  * co-occurrence ≡ the naive self-join when the cap is not binding. */
class GraphSpec extends SparkSuite {
  import spark.implicits._

  private def events(rows: (Long, Long, Long, Long)*) = // user, tsUs, eventId, item
    rows.toDF("user_id", "ts_us", "event_id", "item")

  test("transitionEdges counts consecutive per-user pairs with deterministic tiebreak") {
    val ev = events(
      (1L, 10L, 1L, 7L), (1L, 20L, 2L, 8L), (1L, 30L, 3L, 7L),
      // user 2: two events at the SAME ts — order fixed by event_id
      (2L, 10L, 4L, 5L), (2L, 10L, 5L, 6L), (2L, 40L, 6L, 5L),
      (3L, 10L, 7L, 9L)) // single event → no edge
    val edges = Graph.transitionEdges(ev, "user_id", "ts_us", "event_id", "item")
      .as[(Long, Long, Long)].collect().toSet
    assert(edges === Set((7L, 8L, 1L), (8L, 7L, 1L), (5L, 6L, 1L), (6L, 5L, 1L)))
  }

  /** Single-threaded replay of the documented recurrence. */
  private def referencePageRank(
      nodes: Seq[Long], edges: Seq[(Long, Long, Long)], iters: Int,
      scale: Long): Map[Long, Long] = {
    val n = nodes.size.toLong
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val teleport = (15L * scale) / (100L * n)
    var r = nodes.map(_ -> scale / n).toMap
    for (_ <- 1 to iters) {
      val sums = edges
        .groupBy(_._2).view
        .mapValues(_.map { case (s, _, c) => (r(s) * c) / out(s) }.sum).toMap
      r = nodes.map(nd => nd -> (teleport + (85L * sums.getOrElse(nd, 0L)) / 100L)).toMap
    }
    r
  }

  test("pageRank matches the single-threaded fixed-point replay exactly") {
    // 4 nodes: 1→2 (×2), 2→3, 3→1, 1→3; node 4 dangling both ways
    val edgeList = Seq((1L, 2L, 2L), (2L, 3L, 1L), (3L, 1L, 1L), (1L, 3L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    val got = Graph.pageRank(
        nodes.toDF("node"),
        edgeList.toDF("src", "dst", "cnt"),
        iterations = 4)
      .as[(Long, Long)].collect().toMap
    val want = referencePageRank(nodes, edgeList, 4, 1000000000000L)
    assert(got === want)
    // dangling-in node 4 holds exactly the teleport mass
    assert(got(4L) === (15L * 1000000000000L) / (100L * 4L))
  }

  test("pageRankConverged: early exit at the integer fixed point is bit-identical to fixed-round, in fewer rounds") {
    // a→b chain: a's rank is pure teleport from round 1, so b's rank
    // stops moving after round 3 — an exact integer fixed point the
    // delta check must detect (round 4's delta is 0), well before the
    // 12-round budget
    val edgeList = Seq((1L, 2L, 1L))
    val nodes = Seq(1L, 2L)
    val fixedRound = Graph.pageRank(
        nodes.toDF("node"), edgeList.toDF("src", "dst", "cnt"),
        iterations = 12)
      .as[(Long, Long)].collect().toMap
    val (ranksDf, rounds) = Graph.pageRankConverged(
      nodes.toDF("node"), edgeList.toDF("src", "dst", "cnt"),
      maxIterations = 12)
    val ranks = ranksDf.as[(Long, Long)].collect().toMap
    assert(ranks === fixedRound,
      "early-exit ranks diverged from the fixed-round ranks")
    assert(rounds < 12, s"no early exit: ran all $rounds rounds")
    assert(rounds >= 3, s"exited before the fixed point: $rounds rounds")
    // a non-converging budget (maxIterations below the fixed point)
    // still matches the same-depth fixed-round run exactly
    val (shallow, r2) = Graph.pageRankConverged(
      nodes.toDF("node"), edgeList.toDF("src", "dst", "cnt"),
      maxIterations = 2)
    assert(r2 === 2)
    assert(shallow.as[(Long, Long)].collect().toMap ===
      Graph.pageRank(nodes.toDF("node"), edgeList.toDF("src", "dst", "cnt"),
        iterations = 2).as[(Long, Long)].collect().toMap)
  }

  test("personalized PageRank: seeded replay matches; unreachable non-seeds hold zero") {
    val edgeList = Seq((1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    val seeds = Set(1L)
    val scale = 1000000000000L
    val got = Graph.personalizedPageRank(
        nodes.toDF("node"), edgeList.toDF("src", "dst", "cnt"),
        seeds.toSeq.toDF("node"), iterations = 3)
      .as[(Long, Long)].collect().toMap
    // single-threaded replay of the seeded recurrence
    val out = edgeList.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val tele = (15L * scale) / (100L * seeds.size)
    var r = nodes.map(n => n -> (if (seeds(n)) scale / seeds.size else 0L)).toMap
    for (_ <- 1 to 3) {
      val sums = edgeList.groupBy(_._2).view
        .mapValues(_.map { case (s, _, c) => (r(s) * c) / out(s) }.sum).toMap
      r = nodes.map(n =>
        n -> ((if (seeds(n)) tele else 0L) + (85L * sums.getOrElse(n, 0L)) / 100L)).toMap
    }
    assert(got === r)
    // node 4 has no in-edges and is not a seed: exactly zero mass
    assert(got(4L) === 0L)
    // the seed keeps the most mass in a directed 3-cycle
    assert(got(1L) >= got(2L) && got(1L) >= got(3L))
  }

  test("pageRank concentrates mass on the sink of a star") {
    val star = (1L to 5L).map(i => (i, 99L, 1L)) // everything points at 99
    val nodes = ((1L to 5L) :+ 99L).toDF("node")
    val r = Graph.pageRank(nodes, star.toDF("src", "dst", "cnt"), iterations = 3)
      .as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(i => r(99L) > r(i)))
  }

  test("cooccurrence with a non-binding cap equals the naive distinct self-join") {
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L), (1L, 10L), // dup event, same item
      (2L, 20L), (2L, 30L),
      (3L, 10L), (3L, 30L),
      (4L, 40L)).toDF("user_id", "item")
    val got = Graph.cooccurrence(df, "user_id", "item", maxItemsPerUser = 100)
      .as[(Long, Long, Long)].collect().toSet
    val it = df.distinct().as("a")
    val naive = it.join(it.as("b"),
        col("a.user_id") === col("b.user_id") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("ia"), col("b.item").as("ib"))
      .agg(count(lit(1)).as("n"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === naive)
    assert(got.contains((10L, 30L, 2L))) // users 1 and 3
  }

  test("cooccurrence cap keeps the smallest items deterministically") {
    val df = Seq((1L, 30L), (1L, 10L), (1L, 20L)).toDF("user_id", "item")
    val got = Graph.cooccurrence(df, "user_id", "item", maxItemsPerUser = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 20L, 1L))) // 30 truncated, not 10/20
  }

  test("triangleCounts: exact per-node counts; direction, dups, self-loops ignored") {
    // two triangles sharing node 3, a pendant edge to 6, a self-loop on 7
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L),       // triangle {1,2,3}
      (3L, 4L), (4L, 5L), (5L, 3L),       // triangle {3,4,5}
      (2L, 1L),                           // reverse duplicate of 1-2
      (5L, 6L),                           // pendant: no triangle for 6
      (7L, 7L))                           // self-loop: dropped entirely
      .toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L, 6L -> 0L))
  }

  test("triangleCounts matches the brute-force closed-triple count on K5") {
    // complete graph on 5 nodes: every node is in C(4,2) = 6 triangles
    val k5 = for { a <- 1L to 5L; b <- 1L to 5L; if a < b } yield (a, b)
    val got = Graph.triangleCounts(k5.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(got === (1L to 5L).map(_ -> 6L).toMap)
  }

  test("kHopReach keeps the MINIMUM distance and stops at maxHops") {
    // chain 1→2→3→4→5 with a shortcut 1→3 and a back-edge 2→1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 3L), (2L, 1L))
      .toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    val got = Graph.kHopReach(edges, seeds, maxHops = 3)
      .as[(Long, Long)].collect().toMap
    // 3 is reached in 1 hop via the shortcut (not 2), 5 in 3 via it;
    // seed keeps dist 0 despite the 2→1 back-edge
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L))
  }

  test("kHopReach from multiple seeds unions frontiers with per-node minima") {
    val edges = Seq((1L, 2L), (2L, 3L), (9L, 3L)).toDF("src", "dst")
    val got = Graph.kHopReach(edges, Seq(1L, 9L).toDF("node"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 1L)) // 3 via 9, not 1→2→3
  }

  test("labelPropagation: label = min node id within `rounds` hops; components converge") {
    // two components: a path 1—2—3—4—5 (undirected) and a pair 8—9
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (9L, 8L))
      .toDF("src", "dst")
    val r1 = Graph.labelPropagation(edges, rounds = 1)
      .as[(Long, Long)].collect().toMap
    // one round: min over closed 1-hop neighborhood
    assert(r1 === Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      8L -> 8L, 9L -> 8L))
    val r2 = Graph.labelPropagation(edges, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 3L,
      8L -> 8L, 9L -> 8L))
    // distance-4 radius covers the whole path → connected components
    val r4 = Graph.labelPropagation(edges, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(r4 === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      8L -> 8L, 9L -> 8L))
  }

  test("labelPropagation ignores duplicate and self-loop edges") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  // K4 on {1..4} with a pendant chain 4–5–6: the 2-core is exactly K4,
  // and reaching it needs a CASCADE (6 falls in round 1, exposing 5).
  private val k4Chain = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 6L))

  test("kCorePeel: cascading peel reaches the true 2-core; final degrees are in-core") {
    val edges = k4Chain.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    val got = Graph.kCorePeel(edges, k = 2, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // synchronous semantics: ONE round only peels 6 (5 still sees 4 and 6)
    val oneRound = Graph.kCorePeel(edges, k = 2, rounds = 1, earlyExit = false)
      .as[(Long, Long)].collect().toMap
    assert(oneRound.keySet === Set(1L, 2L, 3L, 4L, 5L))
    assert(oneRound(5L) === 1L) // 6 gone, so 5's induced degree dropped to 1
  }

  test("kCorePeel: early exit is bit-identical to the fixed-round unroll") {
    val edges = k4Chain.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    val fast = Graph.kCorePeel(edges, k = 2, rounds = 8, earlyExit = true)
      .as[(Long, Long)].collect().toSet
    val full = Graph.kCorePeel(edges, k = 2, rounds = 8, earlyExit = false)
      .as[(Long, Long)].collect().toSet
    assert(fast === full)
  }

  test("kCorePeel ignores direction, duplicate edges, weights, and self-loops") {
    val noisy = (k4Chain ++ Seq((2L, 1L), (3L, 3L), (1L, 2L)))
      .map { case (a, b) => (a, b, 7L) }.toDF("src", "dst", "cnt")
    val clean = k4Chain.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    assert(Graph.kCorePeel(noisy, 2, 8).as[(Long, Long)].collect().toSet ===
      Graph.kCorePeel(clean, 2, 8).as[(Long, Long)].collect().toSet)
  }

  test("kCorePeel at k above the max core empties the graph") {
    val edges = k4Chain.map { case (a, b) => (a, b, 1L) }.toDF("src", "dst", "cnt")
    assert(Graph.kCorePeel(edges, k = 4, rounds = 8).count() === 0L)
  }

  /** Single-threaded replay of the documented HITS recurrence. */
  private def referenceHits(
      nodes: Seq[Long], edges: Seq[(Long, Long, Long)], iters: Int,
      scale: Long): Map[Long, (Long, Long)] = {
    def norm(raw: Map[Long, BigInt]): Map[Long, Long] = {
      val m = raw.values.max
      raw.view.mapValues(r => ((r * scale) / m).toLong).toMap
    }
    var auth = nodes.map(_ -> scale).toMap
    var hub = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      hub = norm(edges.groupBy(_._1).view.mapValues(_.map {
        case (_, v, c) => BigInt(auth.getOrElse(v, 0L)) * c }.sum).toMap)
      auth = norm(edges.groupBy(_._2).view.mapValues(_.map {
        case (u, _, c) => BigInt(hub.getOrElse(u, 0L)) * c }.sum).toMap)
    }
    nodes.map(n => n -> (hub.getOrElse(n, 0L), auth.getOrElse(n, 0L))).toMap
  }

  test("hits matches the single-threaded replay; normalization tops at scale; no-edge sides are zero") {
    // hub-shaped: 1 points at everything; 5 is pointed at by everything
    val edgeList = Seq((1L, 2L, 2L), (1L, 3L, 1L), (1L, 5L, 1L),
      (2L, 5L, 3L), (3L, 5L, 1L), (4L, 5L, 1L))
    val nodes = Seq(1L, 2L, 3L, 4L, 5L)
    val got = Graph.hits(nodes.toDF("node"),
        edgeList.toDF("src", "dst", "cnt"), iterations = 2)
      .as[(Long, Long, Long)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
    assert(got === referenceHits(nodes, edgeList, 2, 1000000L))
    assert(got.values.map(_._1).max === 1000000L)
    assert(got.values.map(_._2).max === 1000000L)
    assert(got(5L)._1 === 0L) // sink: no out-edges → zero hub
    assert(got(1L)._2 === 0L) // source: no in-edges → zero auth
    // round 2 promotes node 2 to top hub: its weight-3 edge feeds the
    // top authority, outweighing 1's fan-out — mutual reinforcement at work
    assert(got(2L)._1 === 1000000L)
    assert(got(5L)._2 === 1000000L) // the star sink is the top authority
  }

  test("ssspRounds: min-plus relaxation finds the cheap 2-edge path; unreached nodes stay absent") {
    import spark.implicits._
    // 1→3 direct costs 10; 1→2→3 costs 2 — only a second relaxation
    // sees it. 4→5 is disconnected from the seed.
    val edges = Seq(
      (1L, 3L, 10L), (1L, 2L, 1L), (2L, 3L, 1L), (4L, 5L, 1L)
    ).toDF("src", "dst", "cost")
    val seeds = Seq(1L).toDF("node")
    def dists(rounds: Int): Map[Long, Long] =
      Graph.ssspRounds(edges, seeds, rounds)
        .as[(Long, Long)].collect().toMap
    val r1 = dists(1)
    assert(r1 === Map(1L -> 0L, 2L -> 1L, 3L -> 10L))
    val r2 = dists(2)
    assert(r2 === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // fixed point: a third round changes nothing; 4 and 5 never appear
    assert(dists(3) === r2)
  }

  test("ssspRounds: null-cost edges are absent, a negative cost fails loudly") {
    import spark.implicits._
    val seeds = Seq(1L).toDF("node")
    // null cost = the edge does not exist (node 3 must be ABSENT, not
    // dist NULL) — ADVICE r17
    val withNull = Seq(
      (1L, 2L, Some(1L)), (2L, 3L, None: Option[Long])
    ).toDF("src", "dst", "cost")
    val d = Graph.ssspRounds(withNull, seeds, 2).as[(Long, Long)]
      .collect().toMap
    assert(d === Map(1L -> 0L, 2L -> 1L))
    // a negative cost violates the documented min-plus contract —
    // silently dropping it would return a plausible-looking wrong map,
    // so the relaxation must raise instead
    val negative = Seq((1L, 2L, 1L), (2L, 3L, -1L)).toDF("src", "dst", "cost")
    val e = intercept[Exception] {
      Graph.ssspRounds(negative, seeds, 2).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c =>
      Option(c.getMessage).exists(_.contains("min-plus"))), e.toString)
  }
}
