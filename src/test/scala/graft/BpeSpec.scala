package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Iterated BPE training: k driver-coordinated merge rounds over the
  * distinct-vocab table, replayed against a hand-computed fixture. */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("train replays three hand-computed merge rounds (counts, ties, overlap)") {
    // corpus: "abab" ×2, "ab" ×1, "aaa" ×1
    val docs = Seq((1L, "abab abab ab aaa")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, k = 3)
    // round 1: (a,b) = 2·2 + 1 = 5 beats (b,a)=2 and (a,a)=2 ("aaa"
    //          counts the overlapping pair at both positions)
    // round 2: (ab,ab)=2 ties (a,a)=2 → left-asc tiebreak picks (a,a)
    // round 3: (ab,ab)=2 beats (aa,a)=1
    assert(merges.map(m => (m.left, m.right, m.n, m.round)) === Seq(
      ("a", "b", 5L, 1), ("a", "a", 2L, 2), ("ab", "ab", 2L, 3)))
    // final vocabulary state after the three merges
    val state = vocab.select(concat_ws("|", col("syms")), col("freq"))
      .as[(String, Long)].collect().toMap
    assert(state === Map("abab" -> 2L, "ab" -> 1L, "aa|a" -> 1L))
  }

  test("greedy left-to-right application: aaaa → [aa,aa], aaa → [aa,a]") {
    val df = Seq("aaaa", "aaa").toDF("tok")
      .select(split(col("tok"), "").as("syms"))
      .select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSet
    assert(df === Set(Seq("aa", "aa"), Seq("aa", "a")))
  }

  test("vocabulary running dry stops early with the merges found so far") {
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(docs, k = 10)
    // only two mergeable pairs exist: (a,b) then (c,d); round 3 is dry
    assert(merges.map(m => (m.left, m.right)) === Seq(("a", "b"), ("c", "d")))
    assert(vocab.filter(size(col("syms")) >= 2).count() === 0L)
  }

  test("encode expands the corpus with the trained merges, in token order") {
    val docs = Seq((1L, "abab abab ab aaa"), (2L, "ab b")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs.filter(col("doc_id") === 1L), k = 3)
    val enc = Bpe.encode(docs, merges)
      .as[(Long, Seq[String])].collect().toMap
    // merges [(a,b),(a,a),(ab,ab)]: abab→[abab], ab→[ab], aaa→[aa,a]
    assert(enc(1L) === Seq("abab", "abab", "ab", "aa", "a"))
    // doc 2 reuses the vocab ("ab") and passes unknown-pair symbols through
    assert(enc(2L) === Seq("ab", "b"))
  }

  test("encode(vocab) state agrees with train's final vocabulary") {
    val docs = Seq((1L, "abab abab ab aaa")).toDF("doc_id", "text")
    val (merges, finalVocab) = Bpe.train(docs, k = 3)
    val viaEncode = Bpe.encodeVocab(
      docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
        .distinct(), merges)
      .select(concat_ws("|", col("syms"))).as[String].collect().toSet
    val viaTrain = finalVocab
      .select(concat_ws("|", col("syms"))).as[String].collect().toSet
    assert(viaEncode === viaTrain)
  }

  test("round 1 pair selection agrees with the gated pair-statistics argmax on real data") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val viaTrain = Bpe.topPair(Bpe.symbolVocab(docs)).get
    // independent formulation: substring pairs of the token vocabulary
    // (the gated text_bpe_pairs shape), argmax with the same tiebreak
    val viaSubstr = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .filter(length(col("tok")) >= 2)
      .select(explode(transform(
        sequence(lit(1), length(col("tok")) - 1),
        i => col("tok").substr(i, lit(2)))).as("pair"), col("freq"))
      .groupBy("pair").agg(sum(col("freq")).as("n"))
      .orderBy(desc("n"), asc("pair"))
      .limit(1).collect().head
    assert(viaTrain._1 + viaTrain._2 === viaSubstr.getString(0))
    assert(viaTrain._3 === viaSubstr.getLong(1))
  }

  test("trainReplayable excludes self-pairs from candidates and stops when only self-pairs remain") {
    // unconstrained train picks (a,b) then the SELF-pair (a,a); the
    // replayable trainer takes (a,b), then finds only self-pair
    // candidates ((ab,ab), (a,a)) and stops — counts unchanged
    val docs = Seq((1L, "abab abab ab aaa")).toDF("doc_id", "text")
    val merges = Bpe.trainReplayable(docs, k = 3)
    assert(merges.map(m => (m.left, m.right, m.n, m.round)) ===
      Seq(("a", "b", 5L, 1)))
  }

  test("trainReplayable ≡ train when no round's argmax is a self-pair") {
    val docs = Seq((1L, "ab ab cd"), (2L, "abcd ab")).toDF("doc_id", "text")
    val (viaTrain, _) = Bpe.train(docs, k = 4)
    val viaReplayable = Bpe.trainReplayable(docs, k = 4)
    assert(viaTrain.nonEmpty && viaTrain.forall(m => m.left != m.right))
    assert(viaReplayable === viaTrain)
  }

  test("trainReplaySql unrolls one block per round with the tie-break and two-pass replace") {
    val sql = Bpe.trainReplaySql(4)
    (1 to 4).foreach { i =>
      assert(sql.contains(s"t$i AS"), s"missing round-$i argmax block")
      assert(sql.contains(s"v$i AS"), s"missing round-$i vocab block")
    }
    assert(sql.contains("ORDER BY n DESC, l ASC, r ASC LIMIT 1"))
    // the l ≠ r restriction that licenses the string-replace replay
    assert(sql.contains("a[j] <> a[j+1]"))
    // two replace passes per merge (replaceFoldEquivalence)
    assert("replace\\(replace\\(".r.findAllIn(sql).size === 4)
  }
}
