package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal binary-column plumbing + stubbed decode. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "x" * 100), (2L, "abcd"), (3L, "y" * 64)).toDF("doc_id", "text")

  test("asMedia: binary payload with typed metadata") {
    val m = Multimodal.asMedia(docs).orderBy("doc_id").collect()
    assert(m(0).getAs[Array[Byte]]("payload").length === 100)
    val meta = m(0).getStruct(2)
    assert(meta.getAs[Int]("byte_len") === 100)
    assert(meta.getAs[String]("mime") === "text/plain")
    assert(meta.getAs[String]("content_md5").matches("[0-9a-f]{32}"))
  }

  test("frameSample: floor(byte_len / frame) frames, strided indices, empty payloads dropped") {
    val f = Multimodal.frameSample(Multimodal.asMedia(docs), 32, 2)
    val byDoc = f.groupBy("doc_id").agg(collect_list("frame_idx").as("idx"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).sorted).toMap
    assert(byDoc(1L) === Seq(0, 2)) // 100/32 = 3 frames, stride 2 → 0,2
    assert(!byDoc.contains(2L))     // 4 bytes → 0 frames
    assert(byDoc(3L) === Seq(0))    // 64/32 = 2 frames → 0
  }

  test("decodeFeatures: per-partition stub decode yields normalized histograms") {
    val feats = Multimodal.decodeFeatures(spark, Multimodal.asMedia(docs))
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).byte_len === 100)
    val hist = feats(1L).histogram
    assert(hist.length === 16)
    assert(math.abs(hist.sum - 1.0) < 1e-9)
    // "x" = 0x78 → bin 7 gets everything
    assert(hist(7) === 1.0)
  }

  // --- real codec: javax.imageio behind the same decodeFeatures seam ---

  /** Encode a BufferedImage to real container bytes via ImageIO. */
  private def encodeImage(img: java.awt.image.BufferedImage,
                          format: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, format, bos),
      s"no ImageIO writer for $format")
    bos.toByteArray
  }

  private def solid(rgb: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, rgb)
    img
  }

  test("ImageIoCodec: real 4x4 PNG decodes to pixel-derived luminance features") {
    // top half black (lum 0 → bin 0), bottom half white (lum 255 → bin 15)
    val img = solid(0x000000)
    for (y <- 2 until 4; x <- 0 until 4) img.setRGB(x, y, 0xFFFFFF)
    val png = encodeImage(img, "png")
    // the payload IS a real PNG container (magic bytes), not text
    assert((png(0) & 0xFF) === 0x89 && png(1) === 'P'.toByte)

    val media = Seq((1L, png)).toDF("doc_id", "payload")
    val feats = Multimodal
      .decodeFeatures(spark, media, Multimodal.ImageIoCodec)
      .collect().head
    assert(feats.byte_len === png.length)
    assert(feats.histogram(0) === 0.5)   // 8 black pixels of 16
    assert(feats.histogram(15) === 0.5)  // 8 white pixels of 16
    assert(math.abs(feats.histogram.sum - 1.0) < 1e-12)
  }

  test("ImageIoCodec: JPEG decodes through the same seam; phash buckets real pixels") {
    // three REAL images: two luminance-identical (white PNG + white
    // JPEG — lossy, but a solid field survives ~255), one mid-gray
    val media = Seq(
      (1L, encodeImage(solid(0xFFFFFF), "png")),
      (2L, encodeImage(solid(0xFFFFFF), "jpg")),
      (3L, encodeImage(solid(0x808080), "png"))
    ).toDF("doc_id", "payload")
    val phash = Multimodal
      .decodeFeatures(spark, media, Multimodal.ImageIoCodec)
      .toDF()
      .select(col("doc_id"), expr(
        """aggregate(
             zip_with(histogram, sequence(0, 15),
                      (w, i) -> IF(w > 0.0625D, shiftleft(1L, i), 0L)),
             0L, (a, b) -> a | b)""").as("phash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(phash(1L) === phash(2L),
      "white PNG and white JPEG must land in the same phash bucket")
    assert(phash(1L) !== phash(3L),
      "gray image must land in a different bucket")
    assert(phash(1L) === (1L << 15)) // all luminance in bin 15
    assert(phash(3L) === (1L << 8))  // 0x80 = 128 → bin 8
  }

  /** Render 16-bit mono PCM samples into real WAV container bytes. */
  private def wavBytes(samples: Array[Short]): Array[Byte] = {
    import javax.sound.sampled._
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      pcm(2 * i) = (s & 0xFF).toByte          // little-endian lo
      pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WavCodec: real WAV bytes decode to amplitude histograms through the same seam") {
    val silence = wavBytes(Array.fill[Short](64)(0))
    val half = wavBytes(Array.fill[Short](64)(16384)) // |s|=2^14 → bin 8
    assert(new String(silence.slice(0, 4), "US-ASCII") === "RIFF")
    val media = Seq((1L, silence), (2L, half)).toDF("doc_id", "payload")
    val feats = Multimodal
      .decodeFeatures(spark, media, Multimodal.WavCodec)
      .collect().map(f => f.doc_id -> f.histogram).toMap
    assert(feats(1L)(0) === 1.0)  // all samples in the zero-amplitude bin
    assert(feats(2L)(8) === 1.0)  // half-scale tone → bin 8
    assert(math.abs(feats(1L).sum - 1.0) < 1e-12)
    // corrupt audio fails loudly, like the image codec
    val bad = Seq((3L, "not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(spark, bad, Multimodal.WavCodec).collect()
    }
    assert(e.getMessage.contains("not a decodable audio") ||
      Option(e.getCause).exists(
        _.getMessage.contains("not a decodable audio")))
  }

  test("ImageIoCodec: non-decodable payload fails loudly, never a silent zero vector") {
    val media = Seq((1L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeFeatures(spark, media, Multimodal.ImageIoCodec)
        .collect()
    }
    assert(e.getMessage.contains("not a decodable image") ||
      Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("resizePayload: truncates or zero-pads to the target, meta stays honest") {
    val resized = Multimodal.resizePayload(Multimodal.asMedia(docs), 16)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("payload"), r.getStruct(2).getInt(0))).toMap
    resized.foreach { case (_, (payload, metaLen)) =>
      assert(payload.length === 16)
      assert(metaLen === 16)
    }
    // doc 2's 4-byte payload is zero-padded
    val d2 = resized(2L)._1
    assert(d2.drop(4).forall(_ === 0.toByte))
  }

  test("resizeImage: real decode → scale → re-encode; features survive, meta derives from actual bytes") {
    // the r13 gap: resizePayload only rewrites bytes — this drives the
    // REAL transform on the real 4×4 PNG fixture, down (4→2) and up
    // (4→8); solid fields are interpolation-invariant, so the resized
    // image must decode to the SAME luminance histogram
    val media = Seq(
      (1L, encodeImage(solid(0x808080), "png")),   // gray → bin 8
      (2L, encodeImage(solid(0xFFFFFF), "jpg"))    // white JPEG in, PNG out
    ).toDF("doc_id", "payload")
    for (target <- Seq(2, 8)) {
      val resized = Multimodal.resizeImage(spark, media, target)
      val rows = resized.collect().map(r => r.getLong(0) ->
        (r.getAs[Array[Byte]]("payload"), r.getStruct(2))).toMap
      rows.foreach { case (_, (payload, meta)) =>
        // the output is a REAL PNG of the target geometry
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        assert(img != null && img.getWidth === target &&
          img.getHeight === target)
        // meta derives from the actual re-encoded bytes
        assert(meta.getInt(0) === payload.length)
        assert(meta.getString(2) === "image/png")
      }
      val feats = Multimodal
        .decodeFeatures(spark, resized, Multimodal.ImageIoCodec)
        .collect().map(f => f.doc_id -> f.histogram).toMap
      assert(feats(1L)(8) === 1.0)  // gray survives the rescale exactly
      assert(feats(2L)(15) === 1.0) // white survives JPEG→PNG + rescale
    }
    // non-decodable payloads fail loudly through the same seam
    val bad = Seq((9L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.resizeImage(spark, bad, 2).collect()
    }
    assert(e.getMessage.contains("not a decodable image") ||
      Option(e.getCause).exists(_.getMessage.contains("not a decodable image")))
  }

  test("imageSignature: block-aligned re-encodes hash bit-identically, banded Hamming pairs find every planted duplicate, resizeImage round-trips") {
    import graft.operators.Dedup
    val ids = Seq(1L, 2L, 42L, 255L, 300L).toDF("doc_id")
    def sigs(px: Int) = Multimodal
      .imageSignature(spark, Multimodal.syntheticPatternImages(spark, ids, px))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (s8, s16, s32) = (sigs(8), sigs(16), sigs(32))
    // the same pattern at 1×/2×/4× scale decodes to the SAME signature
    // (area means recover the logical grid exactly) …
    assert(s8 === s16); assert(s8 === s32)
    // … while the payload BYTES differ (different dimensions, fresh
    // encode) — these are genuinely distinct files, not byte copies
    val md8 = Multimodal.syntheticPatternImages(spark, ids, 8)
      .select(col("doc_id"), md5(col("payload"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val md16 = Multimodal.syntheticPatternImages(spark, ids, 16)
      .select(col("doc_id"), md5(col("payload"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.collect().map(_.getLong(0)).forall(i => md8(i) != md16(i)))
    // distinct patterns get distinct signatures (ids chosen in distinct
    // mod-256 classes)
    assert(Set(s8(1L), s8(2L), s8(42L), s8(255L)).size === 4)
    // the banded Hamming join over orig ∪ resized finds EVERY planted
    // (2d, 2d+1) duplicate at distance 0 — recall 1.0 on block-aligned
    // re-encodes, by the pigeonhole guarantee
    val docs = ids
    def variant(px: Int, off: Int) = Multimodal
      .syntheticPatternImages(spark, docs, px)
      .select((col("doc_id") * 2 + off).as("doc_id"), col("payload"))
    val pairSigs = Multimodal.imageSignature(spark,
      variant(8, 0).unionByName(variant(16, 1)))
    val pairs = Dedup.hammingPairsFromSigs(pairSigs, "sig", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val planted = Seq(1L, 2L, 42L, 255L, 300L)
      .map(d => (d * 2, d * 2 + 1)).toSet
    assert(planted.subsetOf(pairs.map(p => (p._1, p._2)).toSet), pairs.toSeq)
    assert(pairs.filter(p => planted((p._1, p._2))).forall(_._3 === 0))
    // a REAL resizeImage (bilinear Graphics2D upscale) of the 8×8
    // pattern re-hashes CLOSE to the original — within the banded
    // join's Hamming-3 reach, so a resized re-encode is still FOUND
    val resized = Multimodal.resizeImage(spark,
      Multimodal.syntheticPatternImages(spark, ids, 8)
        .withColumn("meta", lit(null)), 16)
    val sr = Multimodal.imageSignature(spark, resized)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ids.collect().map(_.getLong(0)).foreach { i =>
      val h = java.lang.Long.bitCount(s8(i) ^ sr(i))
      assert(h <= 3, s"doc $i: bilinear resize drifted $h bits from the original")
    }
    // off-grid images fail loudly (a stray thumbnail is a data-quality
    // event, not a silent skip)
    val odd = Multimodal.syntheticImages(spark,
      Seq((7L, 100L)).toDF("doc_id", "n_chars"), 6)
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.imageSignature(spark, odd).collect()
    }
    assert(e2.getMessage.contains("not a multiple") ||
      Option(e2.getCause).exists(_.getMessage.contains("not a multiple")))
    // the incremental probe law: pairs touching the batch ≡ the full
    // banded join over the union restricted to non-base-only pairs —
    // the fold a daily image crawl runs against its persisted chunk
    // state (and doc 300's planted twin is a CROSS pair here: its 8×8
    // original sits in the base, the 16×16 re-encode in the batch)
    val baseIds = Set(1L, 2L, 42L)
    val vidsAll = variant(8, 0).unionByName(variant(16, 1))
    val sigsAll = Multimodal.imageSignature(spark, vidsAll)
    val crossSplit: Long => Boolean = v =>
      baseIds.contains(v / 2) || (v == 600L) // 300's orig (vid 600) in base
    val baseSigs = sigsAll.filter(
      udf((v: Long) => crossSplit(v)).apply(col("doc_id")))
    val batchSigs = sigsAll.filter(
      udf((v: Long) => !crossSplit(v)).apply(col("doc_id")))
    val inc = Dedup.incrementalHammingPairs(baseSigs, batchSigs, "sig", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = Dedup.hammingPairsFromSigs(sigsAll, "sig", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filterNot(p => crossSplit(p._1) && crossSplit(p._2)).toSet
    assert(inc === full)
    assert(inc.contains((600L, 601L, 0))) // the cross base↔batch twin
  }

  test("audioSignature: time-stretched re-encodes hash bit-identically; distinct envelopes differ; off-grid frames fail loudly") {
    val ids = Seq(1L, 2L, 42L, 255L, 300L).toDF("doc_id")
    def sigs(per: Int) = Multimodal
      .audioSignature(spark,
        Multimodal.syntheticPatternAudio(spark, ids, 57, per))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (s32, s64, s96) = (sigs(32), sigs(64), sigs(96))
    // 2× and 3× time stretches decode to the SAME envelope signature…
    assert(s32 === s64); assert(s32 === s96)
    // …from byte-DIFFERENT WAVs
    val b32 = Multimodal.syntheticPatternAudio(spark, ids, 57, 32)
      .select(col("doc_id"), md5(col("payload"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b64 = Multimodal.syntheticPatternAudio(spark, ids, 57, 64)
      .select(col("doc_id"), md5(col("payload"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.collect().map(_.getLong(0)).forall(i => b32(i) != b64(i)))
    // distinct documents → distinct envelopes
    assert(s32.values.toSet.size === 5)
    // frames that do not divide into the segment grid fail loudly
    val odd = Multimodal.syntheticAudio(spark,
      Seq((7L, 100L)).toDF("doc_id", "n_chars"), 58)
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.audioSignature(spark, odd, 57).collect()
    }
    assert(e.getMessage.contains("do not divide") ||
      Option(e.getCause).exists(_.getMessage.contains("do not divide")))
  }

  test("videoSignature: re-encoded twins hash bit-identically; trims pair when the argmin frame survives; stride samples; bad containers fail loudly") {
    import graft.operators.Dedup
    val ids = Seq(1L, 2L, 42L, 255L, 300L).toDF("doc_id")
    def sigs(px: Int, frames: Int) = Multimodal
      .videoSignature(spark,
        Multimodal.syntheticPatternVideos(spark, ids, px, frames))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pixel-doubled re-encode: byte-different container, identical sig
    val (v8, v16) = (sigs(8, 4), sigs(16, 4))
    assert(v8 === v16)
    val b8 = Multimodal.syntheticPatternVideos(spark, ids, 8, 4)
      .select(col("doc_id"), md5(col("payload"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b16 = Multimodal.syntheticPatternVideos(spark, ids, 16, 4)
      .select(col("doc_id"), md5(col("payload"))).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ids.collect().map(_.getLong(0)).forall(i => b8(i) != b16(i)))
    // min-wise trim law, checked against the per-frame ground truth:
    // the 3-frame trim's signature equals the min over frames 0..2, and
    // it PAIRS with the full video exactly when frame 3 was not the
    // argmin — both directions asserted, so the invariance claim is
    // pinned rather than assumed
    // ground truth via prefix minima: a (f+1)-frame container's sig is
    // by definition min(frame sigs 0..f) — frameSig(id, 0) is frame 0's
    // exact dHash, frameSig(id, f) the running min through frame f
    def frameSig(id: Long, f: Int): Long = {
      val one = Seq(id).toDF("doc_id")
      Multimodal.videoSignature(spark,
          Multimodal.syntheticPatternVideos(spark, one, 8, f + 1))
        .collect()(0).getLong(1)
    }
    val v3 = sigs(8, 3)
    for (i <- Seq(1L, 2L, 42L, 255L, 300L)) {
      val mins = (0 to 3).map(f => frameSig(i, f)) // prefix minima
      assert(v3(i) === mins(2), "3-frame sig != min over frames 0..2")
      assert(v8(i) === mins(3), "4-frame sig != min over frames 0..3")
      if (mins(2) === mins(3)) assert(v3(i) === v8(i))
    }
    // at least one id in the corpus must exercise the survives-trim
    // case, else the pairing claim is vacuous here
    assert(Seq(1L, 2L, 42L, 255L, 300L)
      .exists(i => v3(i) === v8(i)), "no trim-invariant twin planted")
    // the banded join finds every re-encode twin at Hamming 0 and the
    // trim twins where the min survived
    def variant(px: Int, frames: Int, off: Int) = Multimodal
      .syntheticPatternVideos(spark, ids, px, frames)
      .select((col("doc_id") * 3 + off).as("doc_id"), col("payload"))
    val all = Multimodal.videoSignature(spark,
      variant(8, 4, 0).unionByName(variant(16, 4, 1))
        .unionByName(variant(8, 3, 2)))
    val pairs = Dedup.hammingPairsFromSigs(all, "sig", 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    for (i <- Seq(1L, 2L, 42L, 255L, 300L)) {
      assert(pairs.get((i * 3, i * 3 + 1)).contains(0),
        s"re-encode twin of $i not found at Hamming 0")
      if (v3(i) === v8(i))
        assert(pairs.get((i * 3, i * 3 + 2)).contains(0),
          s"trim twin of $i (argmin survived) not found")
    }
    // the incremental probe law on VIDEO signatures (mirrors the image
    // family): pairs touching the batch ≡ the full banded join over the
    // union restricted to non-base-only pairs — and 42's re-encode twin
    // is a CROSS pair (original in the base, 16×16 twin in the batch)
    val vBase: Long => Boolean = v => Set(1L, 2L).contains(v / 3) || v == 126L
    val vBaseSigs = all.filter(udf((v: Long) => vBase(v)).apply(col("doc_id")))
    val vBatchSigs = all.filter(udf((v: Long) => !vBase(v)).apply(col("doc_id")))
    val vInc = Dedup.incrementalHammingPairs(vBaseSigs, vBatchSigs, "sig", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val vFull = Dedup.hammingPairsFromSigs(all, "sig", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .filterNot(p => vBase(p._1) && vBase(p._2)).toSet
    assert(vInc === vFull)
    assert(vInc.contains((126L, 127L, 0))) // 42's cross base↔batch twin
    // stride 2 samples frames {0, 2} ⊂ {0..3}: a subset min can only
    // RISE, and frame 0 is always sampled so it upper-bounds the sig —
    // both exact laws of the min-wise composition
    val strided = Multimodal.videoSignature(spark,
        Multimodal.syntheticPatternVideos(spark, ids, 8, 4), stride = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (i <- Seq(1L, 2L, 42L, 255L, 300L)) {
      assert(strided(i) >= v8(i),
        s"subset-sampled min below the full min for $i")
      assert(strided(i) <= frameSig(i, 0),
        s"strided sig above the always-sampled frame 0 for $i")
    }
    // a non-GVID payload fails loudly
    val junk = Seq((9L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)))
      .toDF("doc_id", "payload")
    val e2 = intercept[org.apache.spark.SparkException] {
      Multimodal.videoSignature(spark, junk).collect()
    }
    assert(e2.getMessage.contains("GVID") ||
      Option(e2.getCause).exists(_.getMessage.contains("GVID")))
  }

  test("pairConsistency: planted mismatched pairs fail the flag; the filter keeps exactly the aligned pairs") {
    // 6 pairs; ids 2 and 5 get images rendered from a SHIFTED length
    // (+40 chars — always a different dominant-luminance bin, wrap
    // included), the cross-modal analogue of a swapped caption
    val base = Seq(
      (1L, "a" * 30), (2L, "b" * 75), (3L, "c" * 140),
      (4L, "d" * 200), (5L, "e" * 250), (6L, "f" * 10))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")).cast("long"))
    val planted = Set(2L, 5L)
    val shifted = base.withColumn("n_chars",
      when(col("doc_id").isin(planted.toSeq: _*), col("n_chars") + 40)
        .otherwise(col("n_chars")))
    val media = Multimodal.syntheticImages(spark, shifted, 4)
      .withColumnRenamed("doc_id", "pair_id")
    val texts = base.select(col("doc_id").as("pair_id"), col("text"))
    val scored = Multimodal.pairConsistency(spark, texts, media)
    val rows = scored.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toMap
    assert(rows.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    for ((id, (tb, mb, ok)) <- rows) {
      if (planted(id)) assert(!ok && tb != mb, s"pair $id must mismatch")
      else assert(ok && tb == mb, s"pair $id must agree")
    }
    // the FILTER semantics: survivors are exactly the aligned pairs
    val kept = scored.filter(col("consistent")).select("pair_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 4L, 6L))
    // and the aligned pairs' media bin really came from a decode of the
    // rendered gray, not from the text side: spot-check pair 3
    // (140 chars -> gray 140 -> bin 8)
    assert(rows(3L)._2 === 8L)
  }
}
