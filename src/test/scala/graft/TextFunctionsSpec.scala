package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Text-analysis column functions. */
class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("topGram: most frequent element, ties to the smallest, empty → (null, 0)") {
    val df = Seq(
      (1L, Seq("b", "a", "b", "c", "a", "b")),   // b wins with 3
      (2L, Seq("z", "a", "z", "a")),             // tie 2-2 → a (smallest)
      (3L, Seq.empty[String])
    ).toDF("id", "arr")
    val r = df.select($"id", TextFunctions.topGram($"arr").as("t"))
      .orderBy("id")
      .select($"id", $"t.tok", $"t.n").collect()
    assert(r(0).getString(1) === "b" && r(0).getLong(2) === 3L)
    assert(r(1).getString(1) === "a" && r(1).getLong(2) === 2L)
    assert(r(2).isNullAt(1) && r(2).getLong(2) === 0L)
  }

  test("scrubPii redacts emails and phone spans, passes clean text through") {
    val df = Seq(
      "write to alice.smith+x@corp.example.org today",
      "call 555-12345 or 020-99 now",
      "no pii here at all").toDF("text")
    val r = df.select(TextFunctions.scrubPii($"text")).collect().map(_.getString(0))
    assert(r(0) === "write to <EMAIL> today")
    assert(r(1) === "call <PHONE> or <PHONE> now")
    assert(r(2) === "no pii here at all")
  }

  test("token counts: whitespace vs regex tokenization") {
    val df = Seq("hello world", "a  b\tc", "don't stop-me now!").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount($"text"),
      TextFunctions.regexTokenCount($"text")).collect()
    assert(r(0).getInt(0) === 2 && r(0).getInt(1) === 2)
    assert(r(1).getInt(0) === 3)
    // don ' t stop - me now ! = 8 regex tokens, 3 whitespace tokens
    assert(r(2).getInt(0) === 3 && r(2).getInt(1) === 8)
  }

  test("shingles: n-grams in order; short docs yield empty array") {
    val df = Seq("a b c d", "a b").toDF("text")
    val r = df.select(TextFunctions.shingles($"text", 3)).collect()
    assert(r(0).getSeq[String](0) === Seq("a b c", "b c d"))
    assert(r(1).getSeq[String](0) === Seq.empty)
  }

  test("stopword ratio and mean token length") {
    val df = Seq("the big the cat").toDF("text")
    val r = df.select(
      TextFunctions.stopwordRatio($"text", Seq("the", "a")),
      TextFunctions.meanTokenLength($"text")).head()
    assert(r.getDouble(0) === 0.5)
    assert(r.getDouble(1) === 12.0 / 4)
  }

  test("langId picks the max-marker language, first language wins ties") {
    val markers = Seq(
      "en" -> Seq("the"), "fr" -> Seq("le"), "de" -> Seq("der"))
    val df = Seq("le chat le chien", "der hund", "nothing matches").toDF("text")
    val r = df.select(TextFunctions.langId($"text", markers)).collect()
    assert(r(0).getString(0) === "fr")
    assert(r(1).getString(0) === "de")
    assert(r(2).getString(0) === "en") // all-zero tie → first declared
  }

  test("fingerprint is whitespace-invariant and md5-shaped") {
    val df = Seq(("a  b c", "a b c")).toDF("x", "y")
    val r = df.select(
      TextFunctions.fingerprint($"x"), TextFunctions.fingerprint($"y")).head()
    assert(r.getString(0) === r.getString(1))
    assert(r.getString(0).matches("[0-9a-f]{32}"))
  }

  test("winnowing: partial overlap shares fingerprints; disjoint docs do not") {
    import org.apache.spark.sql.functions._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // doc 2 shares a 7-token run with doc 1, then diverges
      (2L, "alpha beta gamma delta epsilon zeta eta completely different tail"),
      (3L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val fps = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        TextFunctions.shinglesFromTokens(col("toks"), 3).as("sh"))
      .select(col("doc_id"),
        explode(TextFunctions.winnowFingerprints(col("sh"), 4)).as("fp"))
      .collect().groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getString(1)).toSet }
    // shared ≥ (4+3−1)-token run → at least one common fingerprint
    assert((fps(1L) & fps(2L)).nonEmpty)
    // disjoint vocabulary → zero common fingerprints
    assert((fps(1L) & fps(3L)).isEmpty)
  }

  test("tokenBucket is the first md5 byte; hashedBowSum folds centered weights exactly") {
    // md5("the") = 8fc42c6d... → bucket 0x8f = 143, weight 143-128 = 15
    val one = Seq(Tuple1("the")).toDF("text")
    val b = one.select(TextFunctions.tokenBucket(col("text"))).head().getInt(0)
    assert(b === 0x8f)
    val s = Seq(Tuple1("the the the")).toDF("text")
      .select(TextFunctions.hashedBowSum(col("text"))).head().getLong(0)
    assert(s === 3L * (0x8f - 128))
    // buckets stay in 0..255 over a spread of tokens
    val buckets = (0 until 200).map(i => Tuple1(s"tok$i")).toDF("text")
      .select(TextFunctions.tokenBucket(col("text")).as("b"))
      .collect().map(_.getInt(0))
    assert(buckets.forall(x => x >= 0 && x <= 255))
    // and actually disperse (not all in one bucket)
    assert(buckets.distinct.length > 50)
  }

  test("text_hash_features: buckets in [0,256), |feature| ≤ n_grams, per-doc grams tile 2n−1") {
    val rows = graft.queries.Inventory.byName("text_hash_features")
      .run(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 256))
    assert(rows.forall(r => math.abs(r.getLong(2)) <= r.getLong(3)))
    assert(rows.map(_.getLong(1)).distinct.length > 100) // disperses
    // uni+bigrams of an n-token doc total 2n−1 — the feature fold must
    // account for every gram exactly once
    val gramTotals = rows.groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(3)).sum).toMap
    val expected = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> (2L * r.getLong(1) - 1L)).toMap
    assert(gramTotals === expected.filter(_._2 > 0))
  }
}
