package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Count-Min cell-grid sketch: one-sided error, the εN envelope, cell-wise
  * mergeability, partition invariance, and the superset property the gated
  * `text_freq_cm` composition relies on. Everything here is deterministic —
  * the hash family is fixed xxhash64 — so the probabilistic εN bound is
  * asserted as the measured value on a fixed corpus (if it holds once it
  * holds always). */
class CountMinSpec extends SparkSuite {
  import spark.implicits._

  // zipf-ish corpus: token i appears 600/i times → heavy head, long tail
  private def corpus: DataFrame =
    (1 to 120).flatMap(i => Seq.fill(600 / i)(s"tok$i")).toDF("it")

  private def exact: Map[String, Long] =
    corpus.groupBy("it").count().as[(String, Long)].collect().toMap

  private def estimates(d: Int, w: Int): Map[String, Long] = {
    val sk = CountMin.sketch(corpus, "it", d, w)
    CountMin.estimate(corpus, "it", sk, d, w).as[(String, Long)]
      .collect().toMap
  }

  test("estimates never undercount, and stay within the εN envelope " +
       "even with a collision-heavy grid") {
    val (d, w) = (3, 16) // 120 distinct keys into 16 buckets → collisions
    val est = estimates(d, w)
    val ex = exact
    val n = ex.values.sum
    val epsN = math.ceil(math.E / w * n).toLong
    ex.foreach { case (t, c) =>
      assert(est(t) >= c, s"$t undercounted: ${est(t)} < $c")
      assert(est(t) - c <= epsN,
        s"$t overcounted past eN/w: ${est(t)} - $c > $epsN")
    }
  }

  test("a wide grid is collision-free on this corpus: est ≡ exact") {
    val est = estimates(4, 4096)
    assert(est == exact)
  }

  test("merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B), cell for cell") {
    val (d, w) = (4, 64)
    val a = (1 to 50).flatMap(i => Seq.fill(i)(s"tok$i")).toDF("it")
    val b = (30 to 90).flatMap(i => Seq.fill(91 - i)(s"tok$i")).toDF("it")
    val merged = CountMin.merge(
      CountMin.sketch(a, "it", d, w), CountMin.sketch(b, "it", d, w))
      .as[(Int, Long, Long)].collect().toSet
    val direct = CountMin.sketch(a.unionByName(b), "it", d, w)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == direct)
  }

  test("the sketch is partition-invariant") {
    val (d, w) = (4, 64)
    val s7 = CountMin.sketch(corpus.repartition(7), "it", d, w)
      .as[(Int, Long, Long)].collect().toSet
    val s2 = CountMin.sketch(corpus.coalesce(1), "it", d, w)
      .as[(Int, Long, Long)].collect().toSet
    assert(s7 == s2)
  }

  test("an absent key estimates 0 only through untouched cells — " +
       "est(x) = 0 proves x never appeared") {
    val (d, w) = (4, 4096)
    val sk = CountMin.sketch(corpus, "it", d, w)
    val probe = Seq("never-seen-a", "never-seen-b", "tok1").toDF("it")
    val est = CountMin.estimate(probe, "it", sk, d, w)
      .as[(String, Long)].collect().toMap
    assert(est("tok1") >= exact("tok1"))
    // 4096 cells vs ~120 occupied: the unseen keys hit an empty cell
    assert(est("never-seen-a") == 0L && est("never-seen-b") == 0L)
  }

  test("the SAME sketch plan runs streaming in update mode — state is " +
       "the ≤ d·w cell grid, and the final grid ≡ the batch sketch") {
    // CM's relational form pays off here: because the sketch is a plain
    // bounded-key groupBy, its streaming twin is the identical plan —
    // no custom state operator, and state size is capped by geometry,
    // not vocabulary.
    val (d, w) = (4, 64)
    val in = tmpDir("cm-in")
    val src = spark.readStream.schema("it string").json(in)
    val q = CountMin.sketch(src, "it", d, w)
      .writeStream.format("memory").queryName("cm_grid")
      .outputMode("update").start()
    try {
      val rows = corpus.as[String].collect()
      val (b1, b2) = rows.splitAt(rows.length / 2)
      Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(in, s"b$i.json"),
          b.map(t => s"""{"it":"$t"}""").mkString("\n").getBytes("UTF-8"))
        q.processAllAvailable()
      }
      // memory sink in update mode keeps every emitted version of a
      // cell; counts only grow, so the MAX per (j,h) is the current
      // state (order-free, unlike last())
      val grid = spark.table("cm_grid")
        .groupBy("j", "h").agg(max("c").as("c"))
      assert(grid.count() <= d.toLong * w)
      val streamed = grid.as[(Int, Long, Long)].collect().toSet
      val batch = CountMin.sketch(corpus, "it", d, w)
        .as[(Int, Long, Long)].collect().toSet
      assert(streamed == batch)
    } finally q.stop()
  }

  test("threshold candidates are a superset of the truth under heavy " +
       "collisions (the text_freq_cm composition's license)") {
    val t = 60L
    val truth = exact.filter(_._2 >= t).keySet
    // brutal geometry: everything collides — supersetness must still hold
    val brutal = estimates(2, 8).filter(_._2 >= t).keySet
    assert(truth.subsetOf(brutal), s"missing candidates: ${truth -- brutal}")
    // sane geometry: the prefilter actually prunes the tail
    val sane = estimates(4, 256).filter(_._2 >= t).keySet
    assert(truth.subsetOf(sane), s"missing candidates: ${truth -- sane}")
    assert(sane.size < exact.size, "prefilter should prune at w=256")
  }
}
