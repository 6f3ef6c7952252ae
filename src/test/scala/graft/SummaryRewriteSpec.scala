package graft

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

import graft.plans.MvRegistry

/** Transparent summary routing (plans/SummaryRewrite): an Aggregate
  * over a registered base parquet table re-plans onto the maintained
  * summary — same answer, |keys|-row scan — and every shape the
  * summary cannot PROVABLY answer stays on the base. */
class SummaryRewriteSpec extends SparkSuite {

  import spark.implicits._

  /** Root paths scanned by a plan's relations. */
  private def scannedPaths(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.map(_.toString)
        case _ => Nil
      }
    }.flatten

  private def fixture(): (String, String) = {
    val base = tmpDir("mv-base"); val mv = tmpDir("mv-sum")
    (0L until 1000L)
      .map(i => (s"t${i % 5}", i % 7, if (i % 11 == 0) null
        else java.lang.Long.valueOf(i)))
      .toDF("event_type", "junk", "v_micro")
      .write.mode("overwrite").parquet(base)
    spark.read.parquet(base)
      .groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("v_micro").as("sum_v"),
        count("v_micro").as("nn_v"), min("v_micro").as("min_v"),
        max("v_micro").as("max_v"))
      .write.mode("overwrite").parquet(mv)
    (base, mv)
  }

  private def register(base: String, mv: String): Unit =
    MvRegistry.register("file:" + base, MvRegistry.Summary(
      () => spark.read.parquet(mv), "event_type", "cnt",
      sums = Map("v_micro" -> "sum_v"), nns = Map("v_micro" -> "nn_v"),
      mins = Map("v_micro" -> "min_v"), maxs = Map("v_micro" -> "max_v")))

  test("count+sum at the summary grain re-plans onto the summary, same answer") {
    val (base, mv) = fixture()
    val q = () => spark.read.parquet(base)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("v_micro").as("s"),
        count(col("v_micro")).as("nn"), avg("v_micro").as("a"),
        min("v_micro").as("lo"), max("v_micro").as("hi"))
      .orderBy("event_type")
    val expect = q().collect() // registry empty: computed from base
    register(base, mv)
    try {
      val routed = q()
      val paths = scannedPaths(routed)
      assert(paths.exists(_.contains(mv)), s"summary not scanned: $paths")
      assert(!paths.exists(_.contains(base)), s"base still scanned: $paths")
      assert(routed.collect() === expect)
      // downstream operators survive the switch (exprIds preserved):
      // the post-aggregate filter + projection resolve and agree
      val downstream = q().filter(col("n") > 100L)
        .select(col("event_type"), (col("s") / col("n")).as("avg"))
      assert(downstream.collect().length === 5)
    } finally MvRegistry.clear()
  }

  test("unanswerable shapes bail to the base: filter, avg, distinct, other grain") {
    val (base, mv) = fixture()
    register(base, mv)
    try {
      val reads = Seq(
        // filtered: the summary has no row-level data
        spark.read.parquet(base).filter(col("junk") === 3)
          .groupBy("event_type").agg(count(lit(1)).as("n")),
        // aggregate over an UNregistered column
        spark.read.parquet(base)
          .groupBy("event_type").agg(avg("junk").as("a")),
        // distinct count: never answerable from cnt/sum
        spark.read.parquet(base)
          .groupBy("event_type").agg(countDistinct(col("junk")).as("d")),
        // different grain
        spark.read.parquet(base)
          .groupBy("junk").agg(count(lit(1)).as("n")))
      reads.foreach { df =>
        val paths = scannedPaths(df)
        assert(paths.exists(_.contains(base)), s"expected base scan: $paths")
        assert(!paths.exists(_.contains(mv)), s"summary wrongly used: $paths")
      }
      // and the null-sum subtlety: a SUM the rewrite does serve keeps
      // SUM's null semantics because the summary row itself carries a
      // null sum for all-null groups (maintainAggregate's nnCol rule)
      val s = spark.read.parquet(base).groupBy("event_type")
        .agg(sum("v_micro").as("s")).orderBy("event_type").collect()
      MvRegistry.clear()
      val direct = spark.read.parquet(base).groupBy("event_type")
        .agg(sum("v_micro").as("s")).orderBy("event_type").collect()
      assert(s === direct)
    } finally MvRegistry.clear()
  }
}
