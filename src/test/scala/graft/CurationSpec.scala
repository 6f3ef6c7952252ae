package graft

import org.apache.spark.sql.functions._

import graft.operators.Curation

/** Curation operator semantics (the gated twins live in CurationOps;
  * here: API edges the gate can't see). */
class CurationSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = (0L until 64L)
    .map(i => (i, Seq.fill(10)(s"w$i").mkString(" ")))
    .toDF("doc_id", "text")

  test("curateFullFrom / curateFullCdcFrom over a materialized survivor prefix equal the inline chains") {
    val corpus = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
    val probes = Curation.hashSample(corpus, "doc_id", "bench", rate16 = 2)
    val stop = Seq("the", "a")
    val targets = Map("src0" -> 0.10, "src1" -> 0.02)
    val surv = Curation.qualitySurvivors(corpus, stop, 0.5, 3, 0.8)
      .localCheckpoint(true) // stands in for the persisted table
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(rows(Curation.curateFullFrom(corpus, surv, probes, stop, 8,
        targets, 0.002, "mix", 5000L, 64)) ===
      rows(Curation.curateFull(corpus, probes, stop, 0.5, 3, 0.8, 8,
        targets, 0.002, "mix", 5000L, 64)))
    assert(rows(Curation.curateFullCdcFrom(corpus, surv, probes, stop, 8,
        targets, 0.002, "mix", 5000L)) ===
      rows(Curation.curateFullCdc(corpus, probes, stop, 0.5, 3, 0.8, 8,
        targets, 0.002, "mix", 5000L)))
  }

  test("hashKeep: rate 16 keeps everything, rate 1 keeps ~1/16, rates nest monotonically") {
    def n(r: Int) = Curation.hashSample(docs, "doc_id", "t", r).count()
    assert(n(16) === 64L)
    assert(n(1) < n(8) && n(8) <= n(16))
    // deterministic: the same cut twice is the same set
    val a = Curation.hashSample(docs, "doc_id", "t", 4).select("doc_id")
    assert(a.except(Curation.hashSample(docs, "doc_id", "t", 4).select("doc_id")).isEmpty)
    // a different salt is an independent resample (almost surely differs)
    val b = Curation.hashSample(docs, "doc_id", "u", 4).select("doc_id")
    assert(a.union(b).distinct().count() > a.count())
  }

  test("hashKeep rejects out-of-range rates") {
    intercept[IllegalArgumentException](Curation.hashKeep(col("doc_id"), "t", 0))
    intercept[IllegalArgumentException](Curation.hashKeep(col("doc_id"), "t", 17))
  }

  test("domainCap keeps at most n per domain with a total-ordered tiebreak") {
    val t = Seq((1L, "a", 5L), (2L, "a", 5L), (3L, "a", 7L), (4L, "b", 1L))
      .toDF("doc_id", "source", "n_chars")
    val kept = Curation.domainCap(t, "source", "n_chars", "doc_id", 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 1L, 4L)) // a: 7 then (5, id 1) wins the tie; b: all
  }

  test("decontaminate drops probes, their n-gram overlaps, and nothing else") {
    val corpus = Seq(
      (1L, "one two three four five six seven eight nine ten"),     // probe
      (2L, "xx one two three four five six seven eight yy"),        // shares an 8-gram with 1
      (3L, "one two three four OTHER five six seven eight nine"),   // breaks every 8-gram
      (4L, "totally different words that never overlap anything at all")
    ).toDF("doc_id", "text")
    val probes = corpus.filter($"doc_id" === 1L)
    val kept = Curation.decontaminate(corpus, probes, n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L))
  }

  test("contaminationReport names the overlapping probe and counts shared n-grams exactly") {
    val corpus = Seq(
      (1L, "one two three four five six seven eight nine ten"),   // probe
      (2L, "xx one two three four five six seven eight yy"),      // 1 shared 8-gram with probe 1
      (3L, "one two three four five six seven eight nine zz"),    // 2 shared 8-grams with probe 1
      (4L, "totally different words that never overlap anything at all")
    ).toDF("doc_id", "text")
    val probes = corpus.filter($"doc_id" === 1L)
    val report = Curation.contaminationReport(corpus, probes, n = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // probe vs itself: all 3 of its 8-grams
    assert(report((1L, 1L)) === 3L)
    assert(report((2L, 1L)) === 1L)
    assert(report((3L, 1L)) === 2L)
    // the clean doc never appears
    assert(!report.keySet.exists(_._1 == 4L))
    // the report's keyset is exactly what decontaminate drops
    val dropped = Curation.decontaminate(corpus, probes, n = 8)
      .select("doc_id").as[Long].collect().toSet
    assert(report.keySet.map(_._1) === corpus.select("doc_id").as[Long]
      .collect().toSet -- dropped)
  }

  test("repetitionStats: exact fractions, relational-argmax tie semantics") {
    val d = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = Curation.repetitionStats(d).collect().head
    assert(r.getAs[Long]("n_tokens") === 6L)
    assert(r.getAs[String]("top_tok") === "a")                 // 3 of 6
    assert(math.abs(r.getAs[Double]("top_tok_frac") - 0.5) < 1e-12)
    // bigrams: "a b"×2, "b a"×2, "a c"×1 → tie 2-2 → "a b" (smallest)
    assert(r.getAs[String]("top_bigram") === "a b")
    assert(math.abs(r.getAs[Double]("top_bigram_frac") - 0.4) < 1e-12)
  }

  test("repetitionStats: <2-token docs get null bigram columns, never NaN") {
    // empty text tokenizes to [""] (split semantics) — both rows have
    // exactly one token and therefore no bigrams
    val d = Seq((1L, "solo"), (2L, ""), (3L, "two words"))
      .toDF("doc_id", "text")
    val rows = Curation.repetitionStats(d).orderBy("doc_id").collect()
    val solo = rows(0)
    assert(solo.getAs[Long]("n_tokens") === 1L)
    assert(solo.getAs[String]("top_tok") === "solo")
    assert(solo.getAs[Double]("top_tok_frac") === 1.0)
    assert(solo.isNullAt(solo.fieldIndex("top_bigram")))
    assert(solo.isNullAt(solo.fieldIndex("top_bigram_frac")),
      "1-token doc must yield NULL, not 0/0 = NaN")
    val empty = rows(1)
    assert(empty.getAs[Long]("n_tokens") === 1L) // [""]
    assert(empty.isNullAt(empty.fieldIndex("top_bigram_frac")))
    // a real bigram doc is untouched by the guard
    val two = rows(2)
    assert(two.getAs[String]("top_bigram") === "two words")
    assert(two.getAs[Double]("top_bigram_frac") === 1.0)
    // no NaN anywhere in the output
    assert(rows.forall(r => r.isNullAt(r.fieldIndex("top_bigram_frac")) ||
      !r.getAs[Double]("top_bigram_frac").isNaN))
  }

  test("sampleToMixture: oversampled domains cap at keep-all, rates thin deterministically, zero-target drops") {
    val corpus = (0L until 256L)
      .map(i => (i, if (i < 128) "big" else if (i < 240) "mid" else "rare", s"doc $i"))
      .toDF("doc_id", "source", "text")
    def run() = Curation.sampleToMixture(corpus, "source", "doc_id",
      Map("rare" -> 1.0, "mid" -> 0.1, "big" -> 0.0),
      defaultTarget = 0.0, salt = "t")
    val kept = run().select($"doc_id", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bySrc = kept.groupBy(_._2).view.mapValues(_.length).toMap
    // rare: target 1.0 over 16/256 docs → rate ≫ 1, capped → all 16 kept
    assert(bySrc.getOrElse("rare", 0) === 16)
    // big: target 0 → dropped entirely
    assert(!bySrc.contains("big"))
    // mid: rate256 = floor(256·0.1·256/112) = 58 → ~58/256 of 112 ≈ 25,
    // strictly thinned but non-empty
    assert(bySrc("mid") > 0 && bySrc("mid") < 112)
    // deterministic: the same call yields the same kept set
    assert(run().select($"doc_id").as[Long].collect().toSet ===
      kept.map(_._1).toSet)
  }

  test("selectUnderBudget keeps an exact prefix of the (bucket, doc_id) order") {
    // 3 long low-quality docs (stopword-heavy) + 4 short high-quality
    val corpus = Seq(
      (1L, Seq.fill(30)("the a").mkString(" ")),        // 60 toks, quality ~0
      (2L, Seq.fill(25)("the a").mkString(" ")),
      (3L, Seq.fill(20)("the a").mkString(" ")),
      (4L, (1 to 40).map(i => s"word$i").mkString(" ")), // 40 toks, quality 0.4
      (5L, (1 to 40).map(i => s"term$i").mkString(" ")),
      (6L, (1 to 40).map(i => s"item$i").mkString(" ")),
      (7L, (1 to 40).map(i => s"unit$i").mkString(" "))
    ).toDF("doc_id", "text")
    val kept = Curation.selectUnderBudget(corpus, Seq("the", "a"), budget = 100L)
      .orderBy("doc_id").collect()
    // the four high-quality docs rank first (same bucket, doc_id order):
    // 4 (before=0), 5 (40), 6 (80 + 40 > 100 → out) — so exactly {4, 5}
    assert(kept.map(_.getLong(0)).toSeq === Seq(4L, 5L))
    assert(kept.map(_.getAs[Long]("n_tokens")).sum <= 100L)
    // prefix property: every kept doc's toks_before + own tokens fits
    assert(kept.forall(r =>
      r.getAs[Long]("toks_before") + r.getAs[Long]("n_tokens") <= 100L))
  }

  test("chunkDocs covers every token exactly once") {
    val chunks = Curation.chunkDocs(docs, 3).collect()
    // 10 tokens per doc, 3-word windows → 4 chunks (3+3+3+1)
    assert(chunks.length === 64 * 4)
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.map(_.getAs[Long]("n_tokens")).sum == 10L))
  }

  test("contentDefinedChunks: chunks partition the tokens, boundaries end on md5-'0' tokens") {
    val varied = (0L until 32L)
      .map(i => (i, (0 until 40).map(j => s"t${(i * 7 + j * 13) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    val chunks = Curation.contentDefinedChunks(varied).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.size === 32)
    byDoc.values.foreach { rows =>
      // chunks tile the doc: indices 0..k-1, token counts sum to 40
      assert(rows.map(_.getAs[Long]("chunk_idx")).sorted.toSeq
        === (0L until rows.length.toLong))
      assert(rows.map(_.getAs[Long]("n_tokens")).sum === 40L)
    }
  }

  test("contentDefinedChunks: an insertion re-cuts ONE chunk; the fixed grid re-cuts all downstream") {
    // pick tokens so none is a boundary collision with the insert site
    val base = (0 until 60).map(j => s"t${j % 97}").mkString(" ")
    val edited = ("XINS " + base) // one token prepended
    val two = Seq((0L, base), (1L, edited)).toDF("doc_id", "text")
    val fps = Curation.contentDefinedChunks(two).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getAs[String]("fp")).toSet }
    // all original chunk hashes except the first chunk survive the edit
    val shared = fps(0L).intersect(fps(1L))
    assert(shared.size >= fps(0L).size - 1)
    // the fixed 16-token grid shares NO chunk hash after a 1-token shift
    val grid = Curation.chunkDocs(two, 16).collect()
      .groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getAs[String]("chunk_text")).toSet }
    assert(grid(0L).intersect(grid(1L)).isEmpty)
  }

  test("contentDefinedChunks is map-side: no Exchange, no Join in the plan") {
    val plan = Curation.contentDefinedChunks(docs)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"))
    // no join operator ("Join" alone would false-match array_join)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin")
      && !plan.contains("NestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("ppsSample: hit mass is exact, long docs hit ∝ tokens, result is partition-invariant") {
    // variable-length docs: doc i has i+1 tokens → total = Σ(i+1)
    val varDocs = (0L until 50L)
      .map(i => (i, Seq.fill(i.toInt + 1)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val total = (1L to 50L).sum // 1275
    val k = 10
    val step = total / k // 127
    val sel = Curation.ppsSample(varDocs, k).collect()
    // every pointer (multiple of step in [0, total)) is covered exactly once:
    // Σ n_hits = ceil(total / step), independently of how docs split it
    val expectedHits = (total + step - 1) / step
    assert(sel.map(_.getAs[Long]("n_hits")).sum === expectedHits)
    // selection is biased to long docs: every selected doc covers ≥1
    // pointer, so any doc with n_tokens ≥ step is ALWAYS selected
    val mustHave = (0L until 50L).filter(_ + 1 >= step)
    assert(mustHave.forall(i => sel.exists(_.getAs[Long]("doc_id") == i)))
    // deterministic under repartitioning (the blocked prefix sum must
    // not depend on physical layout)
    val re = Curation.ppsSample(varDocs.repartition(7), k)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(re === sel.map(r => (r.getLong(0), r.getLong(2))).toSet)
  }

  test("packSequences: offsets stay inside the budget and cover tokens contiguously per group") {
    val packed = Curation.packSequences(docs, budget = 25L, groupSize = 16L)
      .orderBy("doc_id").collect()
    assert(packed.forall(r => r.getAs[Long]("seq_offset") >= 0 &&
      r.getAs[Long]("seq_offset") < 25L))
    // within a group, (seq, offset) advances by exactly n_tokens
    packed.groupBy(_.getAs[Long]("pack_group")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("seq_in_group") === cum / 25L)
        assert(r.getAs[Long]("seq_offset") === cum % 25L)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("epochShuffle: global_pos is exactly the global md5 order, epochs re-deal it") {
    val ids = (0L until 500L).map(i => Tuple1(i)).toDF("doc_id")
    def order(epoch: Int): Seq[Long] =
      Curation.epochShuffle(ids, "doc_id", epoch)
        .orderBy("global_pos").select("doc_id")
        .collect().map(_.getLong(0)).toSeq
    val got = order(3)
    // permutation: every id exactly once, positions 1..N
    assert(got.sorted == (0L until 500L))
    val pos = Curation.epochShuffle(ids, "doc_id", 3)
      .select("global_pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (1L to 500L))
    // the blocked assignment IS the global md5 order (bucket chars are
    // a prefix of the sort key) — pin against a driver-side reference
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(i: Long, e: Int): String =
      md.digest(s"$i:$e".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val expect = (0L until 500L).sortBy(i => (h(i, 3), i))
    assert(got == expect)
    // a different epoch re-deals: same population, different order
    val next = order(4)
    assert(next.sorted == (0L until 500L))
    assert(next != got)
    // partition-invariance: positions don't depend on input layout
    val re = Curation.epochShuffle(ids.repartition(13), "doc_id", 3)
      .orderBy("global_pos").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(re == got)
  }

  test("weightedPrioritySample: exact H DIV w selection, no replacement, weight-biased") {
    // weights: doc i has weight (i % 8) * 100 + 1 — a wide skew
    val t = (0L until 400L).map(i => (i, (i % 8) * 100L + 1L))
      .toDF("doc_id", "w")
    val got = Curation.weightedPrioritySample(t, "doc_id", "w", "s", 50)
      .select("doc_id", "priority")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

    // independent recompute of the exact scheme: H = first 12 hex chars
    // of md5("s:<id>") as a 48-bit int, priority = H / w (floor), take
    // the 50 smallest (priority, id)
    def h48(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"s:$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(12)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = (0L until 400L)
      .map(i => (i, h48(i) / ((i % 8) * 100L + 1L)))
      .sortBy { case (id, p) => (p, id) }.take(50)
      .map { case (id, p) => (id, p) }
    assert(got === expect)

    // without replacement: ids unique; exactly k rows
    assert(got.map(_._1).distinct.size === 50)
    // weight bias: the sampled mean weight clearly exceeds the corpus mean
    val meanW = (w: Seq[Long]) => w.sum.toDouble / w.size
    val sampleW = got.map { case (id, _) => (id % 8) * 100L + 1L }
    val corpusW = (0L until 400L).map(i => (i % 8) * 100L + 1L)
    assert(meanW(sampleW) > meanW(corpusW), s"${meanW(sampleW)} vs ${meanW(corpusW)}")
    // deterministic: same call, same set; different salt re-deals
    val again = Curation.weightedPrioritySample(t, "doc_id", "w", "s", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(again === got.map(_._1))
    val other = Curation.weightedPrioritySample(t, "doc_id", "w", "u", 50)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(other !== got.map(_._1))
  }

  test("weightedPrioritySample fails loudly on weights < 1") {
    val bad = Seq((1L, 10L), (2L, 0L)).toDF("doc_id", "w")
    val e = intercept[Exception](
      Curation.weightedPrioritySample(bad, "doc_id", "w", "s", 2).collect())
    def root(t: Throwable): Throwable =
      if (t.getCause == null || t.getCause == t) t else root(t.getCause)
    assert(root(e).getMessage.contains("must be >= 1"),
      root(e).getMessage)
  }

  test("temperatureMixture: exact integer replay; √-flattening downsamples big groups, upsamples small") {
    // 100 'big' docs vs 4 'small': w = 10e6 vs 2e6, tot = 12e6
    val docs = (Seq.fill(100)("big") ++ Seq.fill(4)("small")).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toDF("doc_id", "grp")
    val got = Curation.temperatureMixture(docs, "grp", budget = 52L)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // shares: 10/12 and 2/12 in ppm (floored); targets: 52·w DIV tot
    assert(got("big") === ((100L, 833333L, 43L, 430000L)))
    assert(got("small") === ((4L, 166666L, 8L, 2000000L)))
    // the temperature law: big is downsampled (< 1×), small upsampled,
    // and the flattened share sits between natural (4/104) and uniform
    assert(got("big")._4 < 1000000L && got("small")._4 > 1000000L)
    val naturalSmallPpm = 4L * 1000000L / 104L
    assert(got("small")._2 > naturalSmallPpm && got("small")._2 < 500000L)
  }

  test("temperatureMixture on uniform groups allocates equal shares") {
    val docs = (0 until 60).map(i => (i.toLong, s"g${i % 3}"))
      .toDF("doc_id", "grp")
    val got = Curation.temperatureMixture(docs, "grp", budget = 300L)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.map(_._3).distinct.length === 1) // equal share_ppm
    assert(got.forall(_._4 === 100L))           // equal 1/3 of budget
  }
}
