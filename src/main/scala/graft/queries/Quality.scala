package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType}

import graft.core.Tables
import graft.quality.Checks

/** Data-quality inventory (SURVEY.md §2.11, Q1–Q4 from
  * data_validation_dag.py:306-320), expressed through the reusable
  * `graft.quality.Checks` module and declared as one aggregated query so
  * the DuckDB oracle can verify the violation counts.
  *
  * At scale: one pass over the table computes every check (conditional
  * aggregation), instead of one scan per expectation like the reference.
  */
object Quality {

  val entries: Seq[Entry] = Seq(
    Entry(
      "q1_quality_checks",
      (s, dir) => Checks.report(Tables(s, dir, "events")),
      Some("""SELECT
                COUNT(*) AS n_rows,
                COUNT(*) FILTER (WHERE ts IS NULL) AS null_ts,
                COUNT(*) FILTER (WHERE event_type IS NULL) AS null_event_type,
                COUNT(*) FILTER (WHERE value IS NOT NULL AND value < 0) AS negative_value
              FROM events""")),

    // ⊕ FK referential integrity as a query: orders whose o_custkey has
    // no parent customer, counted per status (anti join → aggregate).
    Entry(
      "q2_fk_orphans",
      (s, dir) => {
        val orphans = Checks.fkOrphans(
          Tables(s, dir, "orders"), "o_custkey",
          Tables(s, dir, "customer"), "c_custkey")
        orphans.groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_orphans"))
          .orderBy("o_orderstatus")
      },
      // NOT EXISTS, not NOT IN: left_anti keeps a NULL child key as an
      // orphan and NOT EXISTS agrees; NOT IN would return zero rows the
      // moment either side contains a NULL.
      Some("""SELECT o_orderstatus, COUNT(*) AS n_orphans
              FROM orders o WHERE NOT EXISTS (
                SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
              GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // ⊕ key-uniqueness violation count (PRIMARY KEY as a validation pass):
    // one aggregate comparing total vs distinct keys.
    Entry(
      "q3_unique_key",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
        // distinct over a STRUCT of the key parts: a struct is never
        // NULL itself, so rows with a NULL component still count —
        // matching DuckDB's row-value COUNT(DISTINCT (a, b)); bare
        // multi-column count_distinct would silently drop them.
        li.agg(
          (count(lit(1)) -
            count_distinct(struct(col("l_orderkey"), col("l_linenumber"))))
            .as("dup_rows"))
      },
      Some("""SELECT COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber)) AS dup_rows
              FROM lineitem""")),

    // ⊕ statistical outlier flags: events whose `value` sits more than
    // 3 population standard deviations from their event_type's mean.
    // The z² > 9 test is algebraically cleared of divisions and square
    // roots — (n·v − S)² > 9·(n·SS − S²) over fixed-point integers
    // (value truncated to milli-units) — so both sides decide every
    // boundary case identically: Spark in DECIMAL(38,0), DuckDB in
    // HUGEINT. Shape: map-side partial stats (5 rows), broadcast back
    // over a re-scan — no full-data shuffle at any scale.
    Entry(
      "q6_value_outliers",
      (s, dir) => graft.operators.Outliers
        .flagged(
          Tables(s, dir, "events")
            .select(col("event_id"), col("event_type"), col("value")),
          "event_type", "value", z = 3)
        .select(col("event_id"), col("event_type"))
        .orderBy("event_id"),
      Some("""WITH v AS (
                SELECT event_id, event_type,
                       CAST(TRUNC(value * 1000.0) AS BIGINT) AS vi
                FROM events WHERE value IS NOT NULL),
              st AS (
                SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(vi) AS s, SUM(vi * vi) AS ss
                FROM v GROUP BY 1)
              SELECT v.event_id, v.event_type
              FROM v JOIN st USING (event_type)
              WHERE st.n >= 2
                AND (st.n * v.vi - st.s) * (st.n * v.vi - st.s)
                      > 9 * (st.n * st.ss - st.s * st.s)
              ORDER BY v.event_id""")),

    // ⊕ expectations as DATA: the reference declares its
    // Great-Expectations checks as a list (data_validation_dag.py:306-320);
    // this entry keeps that shape — (name, violation predicate) pairs
    // evaluated in ONE conditional-aggregation pass and emitted as ROWS
    // (the run report a quality gate publishes). Adding a check adds a
    // row, not a schema change; the scan count stays 1 however many
    // checks the suite declares.
    Entry(
      "q7_expectation_suite",
      (s, dir) => {
        val checks = Seq(
          "event_type_in_domain" ->
            ("event_type IS NOT NULL AND event_type NOT IN " +
              "('view','click','purchase','signup','error')"),
          "ts_not_null" -> "ts IS NULL",
          "user_id_not_null" -> "user_id IS NULL",
          "value_non_negative" -> "value IS NOT NULL AND value < 0")
        val sums = checks.map { case (n, p) =>
          sum(when(expr(p), 1L).otherwise(0L)).as(n) }
        Tables(s, dir, "events")
          .agg(sums.head, sums.tail: _*)
          .selectExpr(s"stack(${checks.size}, " +
            checks.map { case (n, _) => s"'$n', $n" }.mkString(", ") +
            ") AS (check_name, n_violations)")
          .orderBy("check_name")
      },
      Some("""SELECT check_name, n_violations FROM (
                SELECT 'event_type_in_domain' AS check_name,
                       CAST(COUNT(*) FILTER (WHERE event_type IS NOT NULL
                         AND event_type NOT IN
                           ('view','click','purchase','signup','error'))
                         AS BIGINT) AS n_violations
                FROM events
                UNION ALL
                SELECT 'ts_not_null',
                       CAST(COUNT(*) FILTER (WHERE ts IS NULL) AS BIGINT)
                FROM events
                UNION ALL
                SELECT 'user_id_not_null',
                       CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT)
                FROM events
                UNION ALL
                SELECT 'value_non_negative',
                       CAST(COUNT(*) FILTER (WHERE value IS NOT NULL
                                               AND value < 0) AS BIGINT)
                FROM events)
              ORDER BY check_name""")),

    // ⊕ robust outliers via MAD (median absolute deviation): per event
    // type, points with |value − median| > 3·MAD — the quantile-based
    // twin of q6's z² test, immune to the outliers themselves inflating
    // the spread (one fat tail can mask itself under a σ-based flag;
    // the median can't be dragged). Two tiny percentile aggregates
    // (each group collapses before the second pass) + broadcast joins
    // back; both engines interpolate percentiles identically
    // (percentile ≡ quantile_cont — the a11 equivalence) and every
    // arithmetic step (subtract, abs, 3·mad, compare) is the same IEEE
    // op on both sides, so the flag boundary cannot disagree.
    Entry(
      "q8_mad_outliers",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .filter(col("value").isNotNull)
          .select(col("event_type"), col("value"))
        val med = ev.groupBy("event_type")
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy("event_type")
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(
            sum(when(col("adev") > lit(3.0) * col("mad"), 1L).otherwise(0L))
              .as("n_outliers"),
            count(lit(1)).as("n_total"),
            min("med").as("med"), min("mad").as("mad"))
          .orderBy("event_type")
      },
      Some("""WITH ev AS (
                SELECT event_type, value FROM events WHERE value IS NOT NULL),
              md AS (
                SELECT event_type, quantile_cont(value, 0.5) AS med
                FROM ev GROUP BY 1),
              dev AS (
                SELECT ev.event_type, med, ABS(value - med) AS adev
                FROM ev JOIN md USING (event_type)),
              md2 AS (
                SELECT event_type, quantile_cont(adev, 0.5) AS mad
                FROM dev GROUP BY 1)
              SELECT dev.event_type,
                     CAST(COUNT(*) FILTER (adev > 3.0 * mad) AS BIGINT)
                       AS n_outliers,
                     CAST(COUNT(*) AS BIGINT) AS n_total,
                     MIN(med) AS med, MIN(mad) AS mad
              FROM dev JOIN md2 USING (event_type)
              GROUP BY 1 ORDER BY event_type""")),

    // ⊕ null/completeness profile: per column, null count and rate as
    // ROWS — the first profiling pass run on any new table. ONE
    // conditional-aggregation scan however many columns (stack reshapes
    // the wide one-row aggregate), null rate an IEEE ratio of exact
    // counts. Adding a column to the profile adds a row, not a scan.
    Entry(
      "q9_null_profile",
      (s, dir) => {
        val cols = Seq("event_id", "ts", "user_id", "event_type",
          "value", "props")
        val sums =
          sum(lit(1L)).as("__n") +:
          cols.map(c => sum(when(col(c).isNull, 1L).otherwise(0L))
            .as(s"__null_$c"))
        Tables(s, dir, "events")
          .agg(sums.head, sums.tail: _*)
          .selectExpr(s"stack(${cols.size}, " +
            cols.map(c => s"'$c', __null_$c, __n").mkString(", ") +
            ") AS (column_name, n_null, n_total)")
          .withColumn("null_rate",
            col("n_null").cast("double") / col("n_total").cast("double"))
          .orderBy("column_name")
      },
      Some("""WITH w AS (
                SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(COUNT(*) FILTER (event_id IS NULL) AS BIGINT) AS z_event_id,
                       CAST(COUNT(*) FILTER (ts IS NULL) AS BIGINT) AS z_ts,
                       CAST(COUNT(*) FILTER (user_id IS NULL) AS BIGINT) AS z_user_id,
                       CAST(COUNT(*) FILTER (event_type IS NULL) AS BIGINT) AS z_event_type,
                       CAST(COUNT(*) FILTER (value IS NULL) AS BIGINT) AS z_value,
                       CAST(COUNT(*) FILTER (props IS NULL) AS BIGINT) AS z_props
                FROM events)
              SELECT column_name, n_null, n_total,
                     CAST(n_null AS DOUBLE) / CAST(n_total AS DOUBLE)
                       AS null_rate
              FROM (
                SELECT 'event_id' AS column_name, z_event_id AS n_null, n AS n_total FROM w
                UNION ALL SELECT 'ts', z_ts, n FROM w
                UNION ALL SELECT 'user_id', z_user_id, n FROM w
                UNION ALL SELECT 'event_type', z_event_type, n FROM w
                UNION ALL SELECT 'value', z_value, n FROM w
                UNION ALL SELECT 'props', z_props, n FROM w)
              ORDER BY column_name""")),

    // ⊕ distribution-drift report between a base population and a new
    // batch (the check a training pipeline runs before accepting a data
    // refresh): per value-bin counts for both sides, ONE
    // conditional-agg scan — no join, no second pass. The divergence
    // statistic itself (PSI/KL needs ln, an engine-version libm
    // hazard) is left to the consumer; the gated artifact is the exact
    // binned contingency table it is computed from.
    Entry(
      "q10_drift_bins",
      (s, dir) => {
        val ev = Tables(s, dir, "events")
          .filter(col("value").isNotNull)
          .select(floor(col("value") / lit(25.0)).cast(LongType).as("bin"),
            (col("event_id") % 10 === 9).as("is_new"))
        ev.groupBy("bin")
          .agg(
            count(when(!col("is_new"), 1)).as("n_base"),
            count(when(col("is_new"), 1)).as("n_new"))
          .orderBy("bin")
      },
      Some("""SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
                     CAST(COUNT(*) FILTER (event_id % 10 != 9) AS BIGINT)
                       AS n_base,
                     CAST(COUNT(*) FILTER (event_id % 10 = 9) AS BIGINT)
                       AS n_new
              FROM events WHERE value IS NOT NULL
              GROUP BY 1 ORDER BY 1""")),

    // ⊕ order-independent table checksum, per partition key: the
    // replication-integrity primitive (did the CDC-applied replica
    // converge to the source?) — compare per-group (n_rows, checksum)
    // pairs instead of shipping rows. Row digest = md5 over an
    // explicitly-rendered tuple (sentinel-coalesced, money as exact
    // cents — raw double→string rendering is engine-specific and must
    // never enter a digest); 60-bit prefixes SUM in DECIMAL(38,0)
    // (order-free, overflow-free to ~10²⁰ rows) and emit mod 2⁶¹−1 as
    // BIGINT. Map-side partials, one shuffle on the group key; at
    // 100 TB each side computes its own checksums and the diff joins
    // |groups| rows.
    Entry(
      "q11_table_checksum",
      (s, dir) => {
        val d38 = DecimalType(38, 0)
        // EVERY digest component is sentinel-coalesced: concat_ws would
        // silently drop a NULL field (separator and all), letting
        // distinct rows collide, while the oracle's '||' would
        // NULL-propagate — a total, identical rendering on both engines
        // is the only safe form (ADVICE r9).
        val rowStr = concat_ws("|",
          coalesce(col("o_orderkey").cast(StringType), lit("∅")),
          coalesce(col("o_custkey").cast(StringType), lit("∅")),
          coalesce(col("o_orderstatus"), lit("∅")),
          coalesce(col("o_orderpriority"), lit("∅")),
          coalesce(floor(col("o_totalprice") * lit(1e2)).cast(LongType)
            .cast(StringType), lit("∅")))
        Tables(s, dir, "orders")
          .select(col("o_orderstatus"),
            conv(substring(md5(rowStr), 1, 15), 16, 10)
              .cast(LongType).cast(d38).as("h"))
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("hsum"))
          .select(col("o_orderstatus"), col("n_rows"),
            expr("CAST(hsum % 2305843009213693951 AS BIGINT)").as("checksum"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH h AS (
                SELECT o_orderstatus,
                       CAST('0x' || substr(md5(
                         COALESCE(CAST(o_orderkey AS VARCHAR), '∅') || '|' ||
                         COALESCE(CAST(o_custkey AS VARCHAR), '∅') || '|' ||
                         COALESCE(o_orderstatus, '∅') || '|' ||
                         COALESCE(o_orderpriority, '∅') || '|' ||
                         COALESCE(CAST(CAST(FLOOR(o_totalprice * 1e2) AS BIGINT)
                              AS VARCHAR), '∅')), 1, 15) AS BIGINT) AS hv
                FROM orders)
              SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_rows,
                     CAST(SUM(hv) % 2305843009213693951 AS BIGINT) AS checksum
              FROM h GROUP BY 1 ORDER BY 1""")),

    // ⊕ freshness/staleness report: per stream (event_type) the last
    // event time and its lag behind the corpus frontier — the first
    // check an on-call runs when a pipeline "looks stuck" (one source
    // lagging = its ingest died; all lagging = upstream died). One
    // aggregate + a broadcast one-row frontier join; exact integer µs.
    Entry(
      "q12_freshness",
      (s, dir) => {
        val perType = Tables(s, dir, "events")
          .filter(col("ts").isNotNull)
          .groupBy("event_type")
          .agg(max(unix_micros(col("ts"))).as("last_us"),
            count(lit(1)).as("n_events"))
        val frontier = perType.agg(max(col("last_us")).as("frontier_us"))
        perType.crossJoin(broadcast(frontier))
          .select(col("event_type"), col("n_events"),
            col("last_us"),
            (col("frontier_us") - col("last_us")).as("lag_us"))
          .orderBy("event_type")
      },
      Some("""WITH t AS (
                SELECT event_type, MAX(epoch_us(ts)) AS last_us,
                       CAST(COUNT(*) AS BIGINT) AS n_events
                FROM events WHERE ts IS NOT NULL GROUP BY 1),
              f AS (SELECT MAX(last_us) AS frontier_us FROM t)
              SELECT event_type, n_events, last_us,
                     frontier_us - last_us AS lag_us
              FROM t, f ORDER BY event_type""")),

    // ⊕ cross-table reconciliation audit: does the fact table roll up to
    // the header it claims? Per order, Σ over its lineitems of
    // extendedprice·(1−discount)·(1+tax) is compared against
    // o_totalprice, and the per-status mismatch profile is reported —
    // the classic "detail must reconcile to summary" invariant every
    // warehouse audits after a load. Arithmetic contract: the per-row
    // product is ONE fixed IEEE expression floored to BIGINT
    // micro-points (rule 2's sanctioned per-row form), so the order
    // sums, the diff, and the max are exact integers; the single emit
    // division produces the double. Scale shape: the detail aggregate
    // partial-combines on l_orderkey — the same key the header join
    // shuffles on — then the status rollup is |statuses| rows. (On this
    // synthetic corpus the columns are independent draws, so ~every
    // order mismatches — the profile is the point, not a pass/fail.)
    Entry(
      "q13_reconciliation",
      (s, dir) => {
        val li = Tables(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum(expr(
            "CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*1e4) AS BIGINT)"))
            .cast(LongType).as("s_micro"))
        Tables(s, dir, "orders")
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderstatus"),
            abs(col("s_micro") -
              expr("CAST(floor(o_totalprice*1e4) AS BIGINT)")).as("d"))
          .groupBy(col("o_orderstatus"))
          .agg(
            count(lit(1)).cast(LongType).as("n_orders"),
            sum(when(col("d") > 0L, 1L).otherwise(0L)).cast(LongType)
              .as("n_mismatch"),
            (max(col("d")).cast("double") / lit(1e4)).as("max_abs_diff"))
          .orderBy("o_orderstatus")
      },
      Some("""WITH l AS (
                SELECT l_orderkey,
                       SUM(CAST(floor(l_extendedprice*(1-l_discount)*(1+l_tax)*1e4)
                                AS BIGINT)) AS s_micro
                FROM lineitem GROUP BY 1),
              j AS (
                SELECT o_orderstatus,
                       abs(s_micro - CAST(floor(o_totalprice*1e4) AS BIGINT))
                         AS d
                FROM orders JOIN l ON l_orderkey = o_orderkey)
              SELECT o_orderstatus,
                     CAST(COUNT(*) AS BIGINT) AS n_orders,
                     CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_mismatch,
                     CAST(MAX(d) AS DOUBLE) / 1e4 AS max_abs_diff
              FROM j GROUP BY 1 ORDER BY 1""")),

    // functional-dependency audit (Deequ-style consistency profiling):
    // for each candidate FD X → Y, how many X keys map to more than one
    // Y, and how bad the worst key is. Scale shape: ONE aggregate per
    // FD — groupBy(X) with countDistinct(Y) partial-aggregates
    // map-side; nothing joins, nothing is quadratic in keys. The four
    // candidates mix a held FD (c_custkey → c_nationkey: a real key
    // dependency, 0 violations expected — the audit must be able to
    // CONFIRM, not just flag) with violated ones whose counts size any
    // repair/normalization work.
    Entry(
      "q14_fd_audit",
      (s, dir) => {
        def fd(table: String, x: String, y: String) =
          Tables(s, dir, table)
            .groupBy(col(x)).agg(countDistinct(col(y)).as("ny"))
            .agg(
              lit(s"$table: $x -> $y").as("fd"),
              count(lit(1)).cast(LongType).as("n_keys"),
              sum(when(col("ny") > 1L, 1L).otherwise(0L)).cast(LongType)
                .as("n_violating_keys"),
              max(col("ny")).cast(LongType).as("max_distinct_rhs"))
        fd("customer", "c_custkey", "c_nationkey")
          .unionAll(fd("orders", "o_custkey", "o_orderpriority"))
          .unionAll(fd("lineitem", "l_orderkey", "l_suppkey"))
          .unionAll(fd("lineitem", "l_partkey", "l_returnflag"))
          .orderBy("fd")
      },
      Some("""WITH fd1 AS (
                SELECT 'customer: c_custkey -> c_nationkey' AS fd,
                       CAST(COUNT(*) AS BIGINT) AS n_keys,
                       CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT)
                         AS n_violating_keys,
                       CAST(MAX(ny) AS BIGINT) AS max_distinct_rhs
                FROM (SELECT c_custkey, COUNT(DISTINCT c_nationkey) AS ny
                      FROM customer GROUP BY 1)),
              fd2 AS (
                SELECT 'orders: o_custkey -> o_orderpriority' AS fd,
                       CAST(COUNT(*) AS BIGINT),
                       CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT),
                       CAST(MAX(ny) AS BIGINT)
                FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS ny
                      FROM orders GROUP BY 1)),
              fd3 AS (
                SELECT 'lineitem: l_orderkey -> l_suppkey' AS fd,
                       CAST(COUNT(*) AS BIGINT),
                       CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT),
                       CAST(MAX(ny) AS BIGINT)
                FROM (SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS ny
                      FROM lineitem GROUP BY 1)),
              fd4 AS (
                SELECT 'lineitem: l_partkey -> l_returnflag' AS fd,
                       CAST(COUNT(*) AS BIGINT),
                       CAST(SUM(CASE WHEN ny > 1 THEN 1 ELSE 0 END) AS BIGINT),
                       CAST(MAX(ny) AS BIGINT)
                FROM (SELECT l_partkey, COUNT(DISTINCT l_returnflag) AS ny
                      FROM lineitem GROUP BY 1))
              SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
              UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4
              ORDER BY fd""")),

    // ⊕ Benford first-digit audit over order totals — the classic
    // fabricated-data / unit-mixup screen (organic multiplicative
    // amounts follow log10(1+1/d); a flat or spiked profile flags
    // synthetic injection or a currency/unit bug). The leading digit
    // comes from BOUNDED integer range-CASE division — no libm log at
    // row scope — and the expectation constants are fixed ppm literals
    // shared verbatim with the oracle. One conditional-agg scan + a
    // 1-row total broadcast; 9 output rows whatever the table size.
    Entry(
      "q15_benford_profile",
      (s, dir) => {
        // digitCase is documented for positive BIGINT only — enforce the
        // precondition instead of assuming it (ADVICE r16): a zero or
        // negative total would otherwise emit a non-digit 'digit' row
        // whose expected_ppm silently lands in the digit-9 ELSE branch.
        // The total is counted over the SAME filtered relation so the
        // ppm denominator matches the numerators.
        val c = Tables(s, dir, "orders")
          .select(floor(col("o_totalprice")).cast(LongType).as("c"))
          .filter(col("c") >= 1)
        c.select(expr(digitCase("DIV")).as("digit"))
          .groupBy("digit")
          .agg(count(lit(1)).cast(LongType).as("n_orders"))
          .crossJoin(broadcast(c.agg(count(lit(1)).as("__n"))))
          .select(col("digit"), col("n_orders"),
            expr("(n_orders * 1000000L) DIV __n").as("observed_ppm"),
            expr(BenfordPpmCase).cast(LongType).as("expected_ppm"))
          .withColumn("dev_ppm", col("observed_ppm") - col("expected_ppm"))
          .orderBy("digit")
      },
      Some(s"""WITH c AS (
                SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS c FROM orders
                WHERE FLOOR(o_totalprice) >= 1),
              d AS (
                SELECT ${digitCase("//")} AS digit
                FROM c),
              g AS (
                SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders
                FROM d GROUP BY 1),
              t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c)
              SELECT digit, n_orders,
                     CAST((n_orders * 1000000) // (SELECT n FROM t)
                       AS BIGINT) AS observed_ppm,
                     CAST($BenfordPpmCase AS BIGINT) AS expected_ppm,
                     CAST((n_orders * 1000000) // (SELECT n FROM t)
                       - $BenfordPpmCase AS BIGINT) AS dev_ppm
              FROM g ORDER BY digit"""))
  )

  /** Leading decimal digit of the positive BIGINT `c` — a range-CASE
    * whose branch texts are shared verbatim between engines (`div` =
    * Spark `DIV` / DuckDB `//`). Branches cover 10¹⁸ down to 10¹, the
    * FULL positive Long range (review r16: the original 10⁵ cutoff
    * silently emitted two-digit "digits" for totals ≥ 10⁶ — latent on
    * TPC-H's ≤ 6-digit prices, unguarded anywhere else). */
  private def digitCase(div: String): String = {
    val branches = (18 to 1 by -1).map { p =>
      val pow = "1" + "0" * p
      s"WHEN c >= $pow THEN c $div $pow"
    }.mkString("\n                            ")
    s"""CASE $branches
                            ELSE c END"""
  }

  /** ⌊log10(1+1/d)·10⁶⌋ for d = 1..9 — fixed ppm literals (NOT computed
    * at runtime: libm log10 is not correctly-rounded, the literals are).
    * Shared verbatim by the Spark expression and the DuckDB oracle.
    * A `def`, not a `val`: `entries` interpolates it during object init,
    * and a val declared below would still be null at that point. */
  private def BenfordPpmCase: String =
    """CASE digit WHEN 1 THEN 301029 WHEN 2 THEN 176091
                  WHEN 3 THEN 124938 WHEN 4 THEN 96910
                  WHEN 5 THEN 79181  WHEN 6 THEN 66946
                  WHEN 7 THEN 57991  WHEN 8 THEN 51152
                  ELSE 45757 END"""
}
