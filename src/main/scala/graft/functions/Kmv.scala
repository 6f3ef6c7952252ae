package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, expr, md5}
import org.apache.spark.sql.types.StringType

/** K-minimum-values (KMV) distinct sketch over the repo's replayable
  * 48-bit md5 hash family ([[graft.operators.Curation.hexIntSql]]) —
  * the mergeable distinct-count store whose every step is ANSI-SQL
  * replayable, so a DuckDB oracle reproduces the sketch, the merge,
  * and the estimate bit-for-bit (the property HLL sketches lack:
  * `a9`/`a24` are rows-only gates because HLL bit-layouts are
  * engine-specific; the simhash md5 re-oracling of r15/16 is the
  * precedent this generalizes).
  *
  * Sketch = the k smallest DISTINCT hash values of a column, kept as a
  * sorted BIGINT array. Three exact algebraic properties carry the
  * whole design (Bar-Yossef et al. 2002, "Counting distinct elements
  * in a data stream"):
  *
  *   1. MERGE CLOSURE: kminₖ(A ∪ B) = kminₖ(kminₖ(A) ∪ kminₖ(B)) — the
  *      j-th smallest of a union (j ≤ k) is among each part's k
  *      smallest, so per-partition / per-day sketches roll up to the
  *      EXACT sketch of the union. Persist per-(group, day), merge to
  *      any coarser grain without touching raw data again.
  *   2. EXACT REGIME: a sketch with fewer than k entries IS its
  *      input's complete distinct-hash set; a merge whose result has
  *      fewer than k entries therefore had only complete inputs
  *      (a saturated input alone contributes k entries), so the merged
  *      size is the exact distinct-hash count of the union.
  *   3. ESTIMATE REGIME: with hashes uniform on [0, 2⁴⁸), the k-th
  *      smallest h₍ₖ₎ estimates nd ≈ (k−1)·2⁴⁸ / h₍ₖ₎ (RSE ≈ 1/√(k−2)).
  *      Both engines evaluate the SAME floor division over the SAME
  *      integers, so even the approximate value is hash-gateable.
  *      h₍ₖ₎ ≥ k−1 > 0 always (k distinct non-negative integers in
  *      ascending order), so the division can never hit zero.
  *
  * Exactness caveat, stated rather than hidden: the sketch counts
  * distinct HASHES. Equality with COUNT(DISTINCT x) additionally needs
  * md5₄₈ injectivity on the observed value set (collision odds
  * ≈ n²/2⁴⁹ — about 10⁻⁹ at a million distinct values). Consumers that
  * SERVE exact answers from the sketch (the MV distinct routing,
  * [[graft.plans.SummaryRewrite]]) must verify injectivity at build
  * time — [[graft.pipeline.IncrementalFinal.verifiedDistinctLicense]]
  * does exactly that check before any registration.
  *
  * Everything here is a SQL-text builder rather than a Column factory:
  * the same text must appear verbatim on the Spark side and in the
  * DuckDB oracle (modulo list-function naming), which is the repo's
  * standing discipline for engine-exact constructs.
  */
object Kmv {

  /** Hash domain size: hexIntSql reads the first 12 hex chars = 48 bits. */
  val Domain: Long = 1L << 48

  /** Stage the replayable 48-bit hash of `valueCol` as `hashCol` (md5 of
    * the value's string rendering, first 48 bits as BIGINT). Staged once
    * into a real column so the 12-term hex polynomial evaluates over ONE
    * md5 call per row, not twelve. */
  def withHash(df: DataFrame, valueCol: String, hashCol: String): DataFrame =
    df.withColumn("__kmv_md5", md5(col(valueCol).cast(StringType)))
      .withColumn(hashCol,
        expr(graft.operators.Curation.hexIntSql("__kmv_md5")))
      .drop("__kmv_md5")

  /** The oracle-side mirror of [[withHash]]'s hash (DuckDB renders
    * BIGINT→VARCHAR exactly like Spark's CAST AS STRING). */
  def hashDuckSql(valueCol: String): String =
    graft.operators.Curation.hexIntSql(s"md5(CAST($valueCol AS VARCHAR))")

  /** Aggregate: sketch of a staged hash column (k smallest distinct;
    * nulls never enter — collect_set skips them). */
  def sketchSparkSql(hashCol: String, k: Int): String =
    s"slice(array_sort(collect_set($hashCol)), 1, $k)"

  /** DuckDB's `list()` keeps NULLs (unlike collect_set) — the FILTER
    * clause restores identical semantics. */
  def sketchDuckSql(hashCol: String, k: Int): String =
    s"list_slice(list_sort(list(DISTINCT $hashCol) " +
      s"FILTER (WHERE $hashCol IS NOT NULL)), 1, $k)"

  /** Aggregate: merge a column of sketch arrays back into one sketch
    * (property 1 — exact at any rollup grain). */
  def mergeSparkSql(sketchCol: String, k: Int): String =
    s"slice(array_sort(array_distinct(flatten(collect_list($sketchCol)))), 1, $k)"

  def mergeDuckSql(sketchCol: String, k: Int): String =
    s"list_slice(list_sort(list_distinct(flatten(list($sketchCol)))), 1, $k)"

  /** Scalar: distinct-count readout of a (merged) sketch — exact size in
    * the unsaturated regime (property 2), the (k−1)·2⁴⁸ DIV h₍ₖ₎
    * estimator once saturated (property 3). Emits BIGINT on both
    * engines (rule-5 cast discipline). */
  def estimateSparkSql(sketchCol: String, k: Int): String =
    s"CASE WHEN size($sketchCol) < $k THEN CAST(size($sketchCol) AS BIGINT) " +
      s"ELSE CAST(${(k - 1) * Domain}L AS BIGINT) DIV element_at($sketchCol, $k) END"

  def estimateDuckSql(sketchCol: String, k: Int): String =
    s"CAST(CASE WHEN len($sketchCol) < $k THEN len($sketchCol) " +
      s"ELSE ${(k - 1) * Domain} // list_extract($sketchCol, $k) END AS BIGINT)"

  /** Scalar: the θ threshold of a sketch — the k-th smallest hash once
    * saturated, the FULL domain while the sketch is still complete
    * (every hash is known, so the sampled region is everything). The
    * theta-sketch set-operation algebra (Dasgupta et al., "Theta
    * sketches") runs on this: hashes below min(θ_A, θ_B) are a uniform
    * sample of the union both sides fully observed. */
  def thetaSparkSql(sketchCol: String, k: Int): String =
    s"CASE WHEN size($sketchCol) < $k THEN ${Domain}L " +
      s"ELSE element_at($sketchCol, $k) END"

  def thetaDuckSql(sketchCol: String, k: Int): String =
    s"CAST(CASE WHEN len($sketchCol) < $k THEN $Domain " +
      s"ELSE list_extract($sketchCol, $k) END AS BIGINT)"

  /** Scalar: common hashes of two sketches below a shared θ column —
    * the theta-sketch intersection numerator. O(k²) membership scan
    * over two ≤k sorted arrays; both engines evaluate the identical
    * lambda. */
  def commonBelowSparkSql(a: String, b: String, theta: String): String =
    s"size(filter($a, x -> x < $theta AND array_contains($b, x)))"

  def commonBelowDuckSql(a: String, b: String, theta: String): String =
    s"len(list_filter($a, x -> x < $theta AND list_contains($b, x)))"

  /** Scalar: the intersection estimate c·2⁴⁸ DIV θ — exact when both
    * sketches were complete (θ = 2⁴⁸ makes the division an identity,
    * property-2 regime), the standard unbiased θ-scale-up otherwise.
    * c ≤ k ⇒ the product stays ≤ k·2⁴⁸ < 2⁶³. θ ≥ 1 always (hashes are
    * distinct non-negatives, so a saturated k-th minimum is ≥ k−1 ≥ 1
    * for k ≥ 2; the complete regime uses 2⁴⁸). */
  def intersectEstimateSparkSql(common: String, theta: String): String =
    s"CAST(($common * ${Domain}L) DIV $theta AS BIGINT)"

  def intersectEstimateDuckSql(common: String, theta: String): String =
    s"CAST(($common * $Domain) // $theta AS BIGINT)"
}
