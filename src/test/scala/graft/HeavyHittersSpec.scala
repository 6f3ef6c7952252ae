package graft

import org.apache.spark.sql.functions._

import graft.functions.MisraGries
import graft.operators.HeavyHitters

/** Misra–Gries sketch bounds + the two-pass exact top-k built on it. */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._

  /** Reference stream fold, single-threaded. */
  private def runSketch(k: Int, items: Seq[String]): Map[String, Long] = {
    val mg = new MisraGries(k)
    items.foldLeft(mg.zero)(mg.reduce)
  }

  test("sketch never exceeds k counters and undercounts by at most N/(k+1)") {
    // zipf-ish stream: token i appears 200/i times
    val stream = (1 to 40).flatMap(i => Seq.fill(200 / i)(s"t$i"))
    val k = 8
    val sketch = runSketch(k, stream)
    assert(sketch.size <= k)
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong)
    val bound = stream.size.toLong / (k + 1)
    exact.foreach { case (t, n) =>
      val est = sketch.getOrElse(t, 0L)
      assert(est <= n, s"$t overcounted: $est > $n")
      assert(n - est <= bound, s"$t undercounted past N/(k+1): $n - $est > $bound")
      if (n > bound) assert(sketch.contains(t), s"heavy item $t missing")
    }
  }

  test("merge preserves the undercount bound for the combined stream") {
    val s1 = (1 to 20).flatMap(i => Seq.fill(100 / i)(s"t$i"))
    val s2 = (5 to 25).flatMap(i => Seq.fill(120 / i)(s"t$i"))
    val k = 8
    val mg = new MisraGries(k)
    val merged = mg.merge(runSketch(k, s1), runSketch(k, s2))
    assert(merged.size <= k)
    val all = s1 ++ s2
    val exact = all.groupBy(identity).view.mapValues(_.size.toLong)
    val bound = all.size.toLong / (k + 1)
    exact.foreach { case (t, n) =>
      val est = merged.getOrElse(t, 0L)
      assert(est <= n && n - est <= bound)
    }
  }

  test("two-pass topK ≡ plain groupBy top-k on a skewed corpus") {
    val rows = (1 to 30).flatMap(i => Seq.fill(300 / i)(s"w$i")).toDF("tok")
    val viaSketch = HeavyHitters.topK(rows, "tok", k = 10, sketchK = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = rows.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("tok")).limit(10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(viaSketch === exact)
  }

  test("empty input yields an empty result, not a failure") {
    val empty = Seq.empty[String].toDF("tok")
    assert(HeavyHitters.topK(empty, "tok", k = 5, sketchK = 8).count() === 0L)
  }

  test("null items are ignored and non-string columns count exactly (both passes cast alike)") {
    // Integer column with nulls: pass 1 sketches strings, pass 2 must
    // filter through the SAME cast — and no null may reach the sketch
    val rows = ((1 to 40).flatMap(i => Seq.fill(80 / i)(Integer.valueOf(i)))
      ++ Seq.fill(10)(null.asInstanceOf[Integer])).toDF("v")
    val got = HeavyHitters.topK(rows, "v", k = 5, sketchK = 32)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    val exact = rows.filter(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("v")).limit(5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got === exact)
    assert(!got.exists(_._2 == 0L))
  }
}
