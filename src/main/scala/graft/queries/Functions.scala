package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables

/** Scalar-function inventory (SURVEY.md §2.9): JSON extraction, epoch→
  * string time conversion, casts, CASE, ROUND, arithmetic, coalesce,
  * string assembly. All stay inside whole-stage codegen (built-in
  * functions only, no UDFs).
  */
object Functions {

  val entries: Seq[Entry] = Seq(

    // F1/P2: JSON field extraction (SaveDelta.scala:140-147 reads
    // $.payload.after.* with 7 get_json_object calls; from_json parses
    // ONCE into a struct — same results, one pass, ~2× faster measured).
    // Large outputs carry no ORDER BY: the gate canonicalizes rows, and
    // a global sort is exactly the operator you avoid at 100 TB.
    Entry(
      "f1_json_extract",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k")),
      Some("""SELECT event_id, CAST(props->>'$.k' AS INTEGER) AS k
              FROM events""")),

    // F2: µs-epoch → 'yyyy-MM-dd HH:mm:ss' string (SaveDelta.scala:143
    // does from_unixtime(cast(x AS LONG)/1000000)). Session TZ is pinned
    // UTC on both sides; the oracle formats the timestamp directly —
    // same instant, same string.
    Entry(
      "f2_epoch_to_string",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          from_unixtime((unix_micros(col("ts")) / lit(1000000L)).cast(LongType))
            .as("dt_str")),
      Some("""SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS dt_str
              FROM events""")),

    // F3: cast chain (int→string→int round-trip + double→int truncation
    // is avoided: Spark/DuckDB agree on cast-to-int rounding only for
    // exact values, so we cast via floor()).
    Entry(
      "f3_casts",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          col("user_id").cast(StringType).as("user_str"),
          floor(col("value")).cast(LongType).as("value_floor")),
      Some("""SELECT event_id, CAST(user_id AS VARCHAR) AS user_str,
                     CAST(FLOOR(value) AS BIGINT) AS value_floor
              FROM events""")),

    // F4: CASE WHEN ladder (README.md:144-147 eligibility logic shape).
    Entry(
      "f4_case_when",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          when(col("value") >= 150, lit("high"))
            .when(col("value") >= 50, lit("mid"))
            .otherwise(lit("low")).as("band")),
      Some("""SELECT event_id,
                     CASE WHEN value >= 150 THEN 'high'
                          WHEN value >= 50  THEN 'mid'
                          ELSE 'low' END AS band
              FROM events""")),

    // F6/F9/F10: arithmetic + coalesce + deterministic string assembly
    // (slack_notification.py:63-72 message projection shape).
    Entry(
      "f6_string_assembly",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          concat_ws(" ",
            lit("user"), col("user_id").cast(StringType),
            lit("did"), coalesce(col("event_type"), lit("unknown")))
            .as("message")),
      Some("""SELECT event_id,
                     CONCAT_WS(' ', 'user', CAST(user_id AS VARCHAR),
                               'did', COALESCE(event_type, 'unknown')) AS message
              FROM events""")),

    // String-function battery (⊕ beyond the reference's F-set): case
    // mapping, trim, substring, replace, regexp_replace — all codegen'd.
    Entry(
      "f8_string_funcs",
      (s, dir) => Tables(s, dir, "customer")
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("seg_upper"),
          substring(col("c_name"), 1, 8).as("name_prefix"),
          regexp_replace(col("c_name"), "[aeiou]", ".").as("name_masked"),
          length(trim(col("c_name"))).as("name_len")),
      Some("""SELECT c_custkey,
                     UPPER(c_mktsegment) AS seg_upper,
                     SUBSTRING(c_name, 1, 8) AS name_prefix,
                     REGEXP_REPLACE(c_name, '[aeiou]', '.', 'g') AS name_masked,
                     LENGTH(TRIM(c_name)) AS name_len
              FROM customer""")),

    // Date arithmetic (⊕): shifted dates and day differences — the
    // retention/window math an event pipeline derives constantly.
    Entry(
      "f9_date_arith",
      (s, dir) => Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          date_add(col("o_orderdate"), 30).as("due_date"),
          datediff(lit("1998-12-31").cast(DateType), col("o_orderdate"))
            .as("days_to_eoy"),
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr")),
      Some("""SELECT o_orderkey,
                     CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
                     CAST(DATE_DIFF('day', o_orderdate, DATE '1998-12-31') AS INTEGER) AS days_to_eoy,
                     CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
                     CAST(EXTRACT(quarter FROM o_orderdate) AS INTEGER) AS qtr
              FROM orders""")),

    // Lateral explode (⊕): unnest of a derived array — the row-generator
    // shape (shingling, frame sampling) as a first-class declared query.
    Entry(
      "x1_explode",
      (s, dir) => Tables(s, dir, "documents")
        .select(col("doc_id"),
          explode(split(trim(col("text")), "\\s+")).as("tok"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"),
          count_distinct(col("tok")).as("n_uniq")),
      Some("""SELECT doc_id,
                     COUNT(*) AS n_toks,
                     COUNT(DISTINCT tok) AS n_uniq
              FROM (SELECT doc_id,
                           UNNEST(regexp_split_to_array(TRIM(text), '\s+')) AS tok
                    FROM documents)
              GROUP BY doc_id""")),

    // Date/time parts (extension beyond F2/F8): event-time bucketing —
    // the partition-key derivation a date-partitioned 100 TB table uses.
    Entry(
      "f7_date_parts",
      (s, dir) => Tables(s, dir, "events")
        .groupBy(
          date_format(col("ts"), "yyyy-MM-dd").as("day"),
          hour(col("ts")).as("hr"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy("day", "hr"),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS day,
                     CAST(EXTRACT(hour FROM ts) AS INTEGER) AS hr,
                     COUNT(*) AS cnt
              FROM events GROUP BY 1, 2 ORDER BY day, hr""")),

    // ⊕ array aggregation: per-user event-type arrays. collect_list
    // order is partition-dependent, so the array is SORTED — the only
    // deterministic contract a distributed list-agg can offer. The gated
    // column is the sorted array JOINED to one string: the driver's
    // canonicalizer hashes scalar columns only (a LIST column crashes
    // its pandas sort with "unhashable numpy.ndarray"); the genuine
    // parquet-LIST round trip is covered by FunctionsSpec instead.
    Entry(
      "x2_array_agg",
      (s, dir) => Tables(s, dir, "events")
        .groupBy("user_id")
        .agg(
          array_join(sort_array(collect_list("event_type")), " ").as("types"),
          count(lit(1)).as("n"))
        .orderBy("user_id"),
      Some("""SELECT user_id,
                     array_to_string(list_sort(list(event_type)), ' ') AS types,
                     COUNT(*) AS n
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // ⊕ wide→long reshape (the inverse of a10's pivot): the per-priority
    // status counts unpivoted back to (priority, status, n) rows via
    // Dataset.unpivot — Spark's native melt, a zero-shuffle projection
    // over the aggregated (already tiny) wide table. The oracle states
    // the reshape as the dialect-portable UNION ALL.
    Entry(
      "x3_unpivot",
      (s, dir) => Tables(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
          count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
          count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
        .unpivot(
          ids = Array(col("o_orderpriority")),
          values = Array(col("n_f"), col("n_o"), col("n_p")),
          variableColumnName = "status_col",
          valueColumnName = "n")
        .orderBy("o_orderpriority", "status_col"),
      Some("""WITH w AS (
                SELECT o_orderpriority,
                       COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
                       COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
                       COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
                FROM orders GROUP BY 1)
              SELECT o_orderpriority, status_col, CAST(n AS BIGINT) AS n
              FROM (
                SELECT o_orderpriority, 'n_f' AS status_col, n_f AS n FROM w
                UNION ALL
                SELECT o_orderpriority, 'n_o', n_o FROM w
                UNION ALL
                SELECT o_orderpriority, 'n_p', n_p FROM w)
              ORDER BY o_orderpriority, status_col""")),

    // ⊕ math battery — restricted to BIT-EXACT operations on both
    // engines: abs/ceil/floor/sign are integral on doubles, IEEE sqrt is
    // correctly rounded everywhere, pmod is integer arithmetic. (exp/ln/
    // trig are deliberately absent: libm results differ in the last ulp
    // across implementations and would flake the hash gate.)
    Entry(
      "f12_math_funcs",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          abs(col("value")).as("abs_v"),
          ceil(col("value")).as("ceil_v"),
          floor(col("value")).as("floor_v"),
          signum(col("value")).as("sign_v"),
          sqrt(abs(col("value"))).as("sqrt_v"),
          pmod(col("event_id"), lit(7L)).as("mod7"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     abs(value) AS abs_v,
                     CAST(ceiling(value) AS BIGINT) AS ceil_v,
                     CAST(floor(value) AS BIGINT) AS floor_v,
                     CAST(sign(value) AS DOUBLE) AS sign_v,
                     sqrt(abs(value)) AS sqrt_v,
                     event_id % 7 AS mod7
              FROM events ORDER BY event_id""")),

    // ⊕ regex extraction: pull the numeric field out of the props JSON
    // string by pattern — the scrub-and-extract move of log pipelines
    // (F1 does it properly with from_json; this is the regex fallback
    // every pipeline also needs). Spark's Java regex and DuckDB's RE2
    // agree on this \d-class surface.
    Entry(
      "f13_regexp_extract",
      (s, dir) => Tables(s, dir, "events")
        .select(
          col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("k_str"),
          regexp_replace(col("event_type"), "[aeiou]", "_").as("type_scrubbed"))
        .orderBy("event_id"),
      Some("""SELECT event_id,
                     COALESCE(regexp_extract(props, '"k": (\d+)', 1), '') AS k_str,
                     regexp_replace(event_type, '[aeiou]', '_', 'g') AS type_scrubbed
              FROM events ORDER BY event_id""")),

    // ⊕ bitwise battery: scalar shifts/and/xor + the BIT_AND/BIT_OR/
    // BIT_XOR aggregates — flag-mask analytics and the algebra under
    // the z-order layout, checked cross-engine (exact int semantics).
    Entry(
      "f14_bitwise",
      (s, dir) => Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_orderkey").bitwiseAND(lit(255L))).as("k_lo"),
          (col("o_orderkey").bitwiseXOR(col("o_custkey"))).as("k_xor"),
          shiftleft(col("o_custkey").cast("long"), 4).as("c_shl"))
        .groupBy((col("o_orderkey") % 4).as("grp"))
        .agg(
          bit_and(col("k_lo")).as("band"),
          bit_or(col("k_lo")).as("bor"),
          bit_xor(col("k_xor")).as("bxor"),
          sum(col("c_shl")).cast(org.apache.spark.sql.types.LongType).as("shl_sum"))
        .orderBy("grp"),
      Some("""SELECT o_orderkey % 4 AS grp,
                     BIT_AND(o_orderkey & 255) AS band,
                     BIT_OR(o_orderkey & 255) AS bor,
                     BIT_XOR(xor(o_orderkey, o_custkey)) AS bxor,
                     CAST(SUM(o_custkey << 4) AS BIGINT) AS shl_sum
              FROM orders GROUP BY 1 ORDER BY grp""")),

    // ⊕ URL domain extraction — the real input to domain capping /
    // per-site dedup when corpora carry provenance URLs. documents has
    // none, so (text_pii_scrub precedent) URLs are SYNTHESIZED from
    // customer rows identically on both sides; extraction uses the
    // same regex on both engines, certifying Java ≡ RE2 on real
    // matches. Registered-domain = last two host labels before the
    // path (the public-suffix-list-free approximation).
    Entry(
      "f15_url_domain",
      (s, dir) => {
        val url = concat(lit("https://sub"), col("c_custkey").cast("string"),
          lit(".host"), (col("c_custkey") % 50).cast("string"),
          lit(".example.com/p/"), col("c_nationkey").cast("string"),
          lit("?q="), col("c_mktsegment"))
        Tables(s, dir, "customer")
          .select(col("c_custkey"), url.as("url"))
          .select(col("c_custkey"), col("url"),
            regexp_extract(col("url"), "^https?://([^/]+)/", 1).as("host"),
            regexp_extract(col("url"), "([^./]+\\.[^./]+)/", 1).as("reg_domain"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, url,
                     COALESCE(regexp_extract(url, '^https?://([^/]+)/', 1), '') AS host,
                     COALESCE(regexp_extract(url, '([^./]+\.[^./]+)/', 1), '') AS reg_domain
              FROM (
                SELECT c_custkey,
                       'https://sub' || CAST(c_custkey AS VARCHAR) ||
                       '.host' || CAST(c_custkey % 50 AS VARCHAR) ||
                       '.example.com/p/' || CAST(c_nationkey AS VARCHAR) ||
                       '?q=' || c_mktsegment AS url
                FROM customer)
              ORDER BY c_custkey""")),

    // ⊕ higher-order array functions as a first-class gated surface:
    // transform / filter / exists / aggregate-fold / slice over a
    // per-order quantity array. The array is CANONICALIZED by
    // sort_array before any lambda touches it (collect_list order is
    // partition-dependent; the sorted multiset is engine-identical),
    // the fold accumulates exact BIGINT micro-points (rule 2), and the
    // array-typed intermediate is rendered with array_join (rule 5: no
    // list column reaches the gate hash). Lambdas run inside codegen'd
    // expressions map-side — the one shuffle is the orderkey aggregate.
    Entry(
      "f16_array_hof",
      (s, dir) => Tables(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_quantity"))).as("arr"))
        .select(
          col("l_orderkey"),
          size(col("arr")).as("n_items"),
          expr("size(filter(arr, x -> x > 25.0))").as("n_big"),
          expr("""aggregate(arr, 0L,
                    (acc, x) -> acc + CAST(floor(x * 1e4) AS BIGINT))""")
            .as("total_micro"),
          expr("exists(arr, x -> x < 2.0)").as("has_small"),
          expr("""array_join(transform(slice(arr, 1, 3),
                    x -> CAST(CAST(floor(x) AS BIGINT) AS STRING)), ':')""")
            .as("first3"))
        .orderBy("l_orderkey"),
      Some("""WITH a AS (
                SELECT l_orderkey, list_sort(list(l_quantity)) AS arr
                FROM lineitem GROUP BY 1)
              SELECT l_orderkey,
                     CAST(len(arr) AS INT) AS n_items,
                     CAST(len(list_filter(arr, x -> x > 25.0)) AS INT)
                       AS n_big,
                     CAST(list_sum(list_transform(arr,
                            x -> CAST(floor(x * 1e4) AS BIGINT)))
                          AS BIGINT) AS total_micro,
                     len(list_filter(arr, x -> x < 2.0)) > 0 AS has_small,
                     array_to_string(list_transform(arr[1:3],
                       x -> CAST(CAST(floor(x) AS BIGINT) AS VARCHAR)), ':')
                       AS first3
              FROM a ORDER BY l_orderkey"""))
  )
}
