package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.Tables
import graft.operators.Graph

/** Graph-analytics inventory (⊕ beyond reference parity) over the item
  * id carried in `events.props` (`{"k": <item>}`): co-occurrence and
  * PageRank on the per-user transition graph.
  *
  * Both gates are exact: co-occurrence runs with the cap above the true
  * per-user distinct count (self-join semantics), and PageRank is
  * fixed-point integer arithmetic, so the unrolled-CTE oracle matches
  * hash-for-hash — see `operators/Graph.scala`.
  */
object GraphOps {

  private val SCALE = 1000000000000L // one unit of PageRank mass

  val entries: Seq[Entry] = Seq(

    // users-who-touched-both item pairs, top 20 by support. The operator
    // folds per-user capped item arrays and expands pairs map-side; the
    // oracle states the same semantics as the naive distinct self-join.
    Entry(
      "g1_item_cooccurrence",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"),
            get_json_object(col("props"), "$.k").cast(LongType).as("item"))
        Graph.cooccurrence(ev, "user_id", "item", maxItemsPerUser = 1000)
          .orderBy(col("n_users").desc, col("item_a"), col("item_b"))
          .limit(20)
      },
      Some("""WITH it AS (
                SELECT DISTINCT user_id, CAST(props->>'$.k' AS BIGINT) AS item
                FROM events
                WHERE user_id IS NOT NULL AND (props->>'$.k') IS NOT NULL)
              SELECT a.item AS item_a, b.item AS item_b,
                     CAST(COUNT(*) AS BIGINT) AS n_users
              FROM it a JOIN it b
                ON a.user_id = b.user_id AND a.item < b.item
              GROUP BY 1, 2
              ORDER BY n_users DESC, item_a, item_b LIMIT 20""")),

    // 3 rounds of damping-0.85 PageRank over the per-user item
    // transition graph, exact fixed-point integers. The oracle unrolls
    // the identical recurrence as three CTE stages — the independent
    // relational formulation of the same iteration.
    Entry(
      "g2_pagerank",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast(LongType).as("item"))
          .filter(col("item").isNotNull)
        val edges = Graph.transitionEdges(ev, "user_id", "ts", "event_id", "item")
        val nodes = ev.select(col("item").as("node")).distinct()
        Graph.pageRank(nodes, edges, iterations = 3, scale = SCALE)
          .orderBy("node")
      },
      Some(s"""WITH ev AS (
                SELECT user_id, ts, event_id,
                       CAST(props->>'$$.k' AS BIGINT) AS item
                FROM events),
              ev2 AS (SELECT * FROM ev WHERE item IS NOT NULL),
              tr AS (
                SELECT item,
                       LAG(item) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
                FROM ev2),
              edges AS (
                SELECT prev AS src, item AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
              outdeg AS (
                SELECT src, CAST(SUM(cnt) AS BIGINT) AS out_cnt
                FROM edges GROUP BY 1),
              e AS (
                SELECT edges.src, edges.dst, edges.cnt, outdeg.out_cnt
                FROM edges JOIN outdeg USING (src)),
              nodes AS (SELECT DISTINCT item AS node FROM ev2),
              p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
              r0 AS (
                SELECT node, ${SCALE} // (SELECT n FROM p) AS pr FROM nodes),
              c1 AS (
                SELECT e.dst, SUM((r.pr * e.cnt) // e.out_cnt) AS s
                FROM e JOIN r0 r ON e.src = r.node GROUP BY 1),
              r1 AS (
                SELECT n.node,
                       (${15L * SCALE} // (100 * (SELECT n FROM p)))
                         + (85 * COALESCE(c.s, 0)) // 100 AS pr
                FROM nodes n LEFT JOIN c1 c ON n.node = c.dst),
              c2 AS (
                SELECT e.dst, SUM((r.pr * e.cnt) // e.out_cnt) AS s
                FROM e JOIN r1 r ON e.src = r.node GROUP BY 1),
              r2 AS (
                SELECT n.node,
                       (${15L * SCALE} // (100 * (SELECT n FROM p)))
                         + (85 * COALESCE(c.s, 0)) // 100 AS pr
                FROM nodes n LEFT JOIN c2 c ON n.node = c.dst),
              c3 AS (
                SELECT e.dst, SUM((r.pr * e.cnt) // e.out_cnt) AS s
                FROM e JOIN r2 r ON e.src = r.node GROUP BY 1),
              r3 AS (
                SELECT n.node,
                       (${15L * SCALE} // (100 * (SELECT n FROM p)))
                         + (85 * COALESCE(c.s, 0)) // 100 AS pr
                FROM nodes n LEFT JOIN c3 c ON n.node = c.dst)
              SELECT node, CAST(pr AS BIGINT) AS pr
              FROM r3 ORDER BY node""")),

    // personalized PageRank from seed items {0..4}: teleport mass
    // returns only to the seeds — "what does the neighborhood of these
    // items look like under random walks with restart". Same exact
    // fixed-point arithmetic, seeded r₀/teleport; oracle unrolls the
    // identical three rounds with the seed indicator as a CASE.
    Entry(
      "g3_ppr_seeded",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast(LongType).as("item"))
          .filter(col("item").isNotNull)
        val edges = Graph.transitionEdges(ev, "user_id", "ts", "event_id", "item")
        val nodes = ev.select(col("item").as("node")).distinct()
        val seeds = nodes.filter(col("node") < 5)
        Graph.personalizedPageRank(nodes, edges, seeds, iterations = 3,
            scale = SCALE)
          .orderBy("node")
      },
      Some(s"""WITH ev AS (
                SELECT user_id, ts, event_id,
                       CAST(props->>'$$.k' AS BIGINT) AS item
                FROM events),
              ev2 AS (SELECT * FROM ev WHERE item IS NOT NULL),
              tr AS (
                SELECT item,
                       LAG(item) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
                FROM ev2),
              edges AS (
                SELECT prev AS src, item AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM tr WHERE prev IS NOT NULL GROUP BY 1, 2),
              outdeg AS (
                SELECT src, CAST(SUM(cnt) AS BIGINT) AS out_cnt
                FROM edges GROUP BY 1),
              e AS (
                SELECT edges.src, edges.dst, edges.cnt, outdeg.out_cnt
                FROM edges JOIN outdeg USING (src)),
              nodes AS (SELECT DISTINCT item AS node FROM ev2),
              seeds AS (SELECT node FROM nodes WHERE node < 5),
              sp AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM seeds),
              r0 AS (
                SELECT n.node,
                       CASE WHEN s.node IS NOT NULL
                            THEN ${SCALE} // (SELECT ns FROM sp)
                            ELSE 0 END AS pr
                FROM nodes n LEFT JOIN seeds s ON n.node = s.node),
              c1 AS (
                SELECT e.dst, SUM((r.pr * e.cnt) // e.out_cnt) AS s
                FROM e JOIN r0 r ON e.src = r.node GROUP BY 1),
              r1 AS (
                SELECT n.node,
                       CASE WHEN s.node IS NOT NULL
                            THEN ${15L * SCALE} // (100 * (SELECT ns FROM sp))
                            ELSE 0 END
                         + (85 * COALESCE(c.s, 0)) // 100 AS pr
                FROM nodes n
                  LEFT JOIN seeds s ON n.node = s.node
                  LEFT JOIN c1 c ON n.node = c.dst),
              c2 AS (
                SELECT e.dst, SUM((r.pr * e.cnt) // e.out_cnt) AS s
                FROM e JOIN r1 r ON e.src = r.node GROUP BY 1),
              r2 AS (
                SELECT n.node,
                       CASE WHEN s.node IS NOT NULL
                            THEN ${15L * SCALE} // (100 * (SELECT ns FROM sp))
                            ELSE 0 END
                         + (85 * COALESCE(c.s, 0)) // 100 AS pr
                FROM nodes n
                  LEFT JOIN seeds s ON n.node = s.node
                  LEFT JOIN c2 c ON n.node = c.dst),
              c3 AS (
                SELECT e.dst, SUM((r.pr * e.cnt) // e.out_cnt) AS s
                FROM e JOIN r2 r ON e.src = r.node GROUP BY 1),
              r3 AS (
                SELECT n.node,
                       CASE WHEN s.node IS NOT NULL
                            THEN ${15L * SCALE} // (100 * (SELECT ns FROM sp))
                            ELSE 0 END
                         + (85 * COALESCE(c.s, 0)) // 100 AS pr
                FROM nodes n
                  LEFT JOIN seeds s ON n.node = s.node
                  LEFT JOIN c3 c ON n.node = c.dst)
              SELECT node, CAST(pr AS BIGINT) AS pr
              FROM r3 ORDER BY node"""))
  )
}
