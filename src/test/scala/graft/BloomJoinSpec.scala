package graft

import org.apache.spark.sql.functions._

import graft.operators.BloomJoin

/** Bloom pre-filtered semi-join: no false negatives ever, exact result
  * even under heavy false-positive pressure, bounded sketch shipment. */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  test("mightContain never misses an inserted key (no false negatives)") {
    val keys = (1L to 500L).map(_ * 7919L)
    val df = keys.toDF("k")
    val bm = BloomJoin.buildBitmap(df, "k", numWords = 64, numHashes = 4)
    val missed = df.filter(!BloomJoin.mightContain(col("k"), bm, 4)).count()
    assert(missed === 0L)
  }

  test("bitmap rejects most non-members at a sane sizing") {
    val members = (1L to 200L).toDF("k")
    val bm = BloomJoin.buildBitmap(members, "k", numWords = 256, numHashes = 4)
    val probes = (100001L to 102000L).toDF("k")
    val fp = probes.filter(BloomJoin.mightContain(col("k"), bm, 4)).count()
    assert(fp < 100L, s"false-positive rate implausibly high: $fp/2000")
  }

  test("semiJoin is exact even when the bitmap is tiny (saturated, all-FP regime)") {
    val big = (1L to 1000L).map(i => (i, s"row$i")).toDF("k", "payload")
    val small = Seq(3L, 500L, 999L, 500L).toDF("sk") // dup key too
    // numWords = 1 → 64 bits for 3 keys ⇒ plenty of false positives;
    // the verify join must still reduce to the exact semi join
    val got = BloomJoin.semiJoin(big, small, "k", "sk", numWords = 1, numHashes = 4)
      .as[(Long, String)].collect().toSet
    val want = big.join(small.select(col("sk").as("k")).distinct(), Seq("k"), "left_semi")
      .as[(Long, String)].collect().toSet
    assert(got === want)
    assert(got.map(_._1) === Set(3L, 500L, 999L))
  }

  test("empty small side yields an empty result and an all-zero bitmap") {
    val big = (1L to 50L).toDF("k")
    val small = spark.emptyDataset[Long].toDF("sk")
    val bm = BloomJoin.buildBitmap(small, "sk", numWords = 8, numHashes = 4)
    assert(bm.forall(_ === 0L))
    assert(BloomJoin.semiJoin(big, small, "k", "sk", numWords = 8).count() === 0L)
  }

  test("null keys are ignored on both sides") {
    val big = Seq(Some(1L), None, Some(2L)).toDF("k")
    val small = Seq(Some(2L), None).toDF("sk")
    val got = BloomJoin.semiJoin(big, small, "k", "sk", numWords = 8)
      .select("k").as[Option[Long]].collect().toSeq
    assert(got === Seq(Some(2L)))
  }
}
