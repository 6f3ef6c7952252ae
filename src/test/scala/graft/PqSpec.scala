package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.vecDot
import graft.operators.{ProductQuantizer => Pq}

/** Product quantization semantics: lossless round-trip on codebook
  * members, the ADC micro-point error envelope, trained-vs-sampled
  * distortion, the recall dial, and the no-product plan shape. */
class PqSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val emb = graft.core.Tables(spark, sfDir, "embeddings")
  private lazy val sub = Pq.subvectors(emb, "vec_id", "embedding", 8, 8)
  private lazy val cb = Pq.sampleCodebook(emb, 32, 8, 8)

  test("codebook members encode to their own subvector (lossless on the sample)") {
    val enc = Pq.encode(sub, cb)
    // join the chosen codeword back and compare the actual arrays —
    // tie-safe: a duplicate subvector would pick the lower cid but
    // still reconstruct identically
    val bad = enc.filter(col("vec_id") < 32)
      .join(sub, Seq("vec_id", "s"))
      .join(cb.select(col("cid").as("code"), col("s"), col("c")), Seq("code", "s"))
      .filter(col("v") =!= col("c"))
      .count()
    assert(bad === 0L)
  }

  test("ADC dot equals the true dot on codebook-member neighbors within m micro-floors") {
    val enc = Pq.encode(sub, cb)
    val qsub = sub.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "query_id")
    val adc = Pq.adcTopK(enc, qsub, cb, 1000)
      .filter(col("neighbor_id") < 32) // lossless side
    val q = emb.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val d = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"))
    val checked = adc.join(q, "query_id").join(d, "neighbor_id")
      .select(col("adc_dot"), vecDot(col("qe"), col("ne")).as("true_dot"))
      .collect()
    assert(checked.nonEmpty)
    checked.foreach { r =>
      // each of the m=8 LUT entries floors once: error in [0, 8e-6)
      val err = r.getDouble(1) - r.getDouble(0)
      assert(err >= 0.0 && err < 8e-6, s"ADC drifted: $r")
    }
  }

  test("trained k-means codebook beats the arbitrary sample at equal size") {
    val trained = Pq.trainCodebooks(emb, nCodes = 32, m = 8, subDim = 8)
    val mseOf = (codebook: org.apache.spark.sql.DataFrame) =>
      Pq.distortionReport(sub, codebook)
        .agg(sum(col("mse"))).head().getDouble(0)
    val trainedMse = mseOf(trained)
    val sampledMse = mseOf(cb)
    assert(trainedMse < sampledMse,
      s"k-means distortion $trainedMse not below sampled $sampledMse")
  }

  test("ADC recall@5 grows with codebook size and clears the floor") {
    val qsub = sub.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "query_id")
    // dot-metric ground truth (PQ here targets max inner product)
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val truth = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        vecDot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(desc("dot"), asc("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id")
    def recallAt5(nCodes: Int): Double = {
      val book = Pq.trainCodebooks(emb, nCodes, m = 8, subDim = 8)
      val got = Pq.adcTopK(Pq.encode(sub, book), qsub, book, 5)
        .select("query_id", "neighbor_id")
      val hit = truth.join(got, Seq("query_id", "neighbor_id")).count()
      hit.toDouble / truth.count().toDouble
    }
    // this corpus is random i.i.d. floats — PQ's worst case (no cluster
    // structure to spend the code budget on), so absolute recall is
    // modest by construction (measured: 0.06 @ 2 codes, 0.22 @ 16).
    // The honest assertions are the dial (more codes ⇒ no worse) and a
    // 10×-over-chance floor (random top-5 of ~500 recalls ≈ 0.01).
    val coarse = recallAt5(2)
    val fine = recallAt5(16)
    assert(fine >= coarse, s"recall fell with codebook size: $coarse -> $fine")
    assert(fine >= 0.1, s"16-code trained recall@5 = $fine below 10x-chance floor")
  }

  test("exact re-rank recall@5 dominates single-stage ADC recall@5 (two-stage serving)") {
    val qsub = sub.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "query_id")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val truth = emb.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        vecDot(col("qe"), col("embedding")).as("dot"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(desc("dot"), asc("neighbor_id"))))
      .filter(col("rank") <= 5)
      .select("query_id", "neighbor_id")
    val enc = Pq.encode(sub, cb)
    val n = truth.count().toDouble
    def recall(got: org.apache.spark.sql.DataFrame): Double =
      truth.join(got.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id")).count() / n
    val plain = recall(Pq.adcTopK(enc, qsub, cb, 5))
    val reranked = recall(Pq.rerankExact(
      Pq.adcTopK(enc, qsub, cb, 20), emb, emb.filter(col("vec_id") < 10), 5))
    // a true neighbor caught by the shortlist can only move UP under
    // exact ranking, so this dominance is a theorem, not a tendency
    assert(reranked >= plain, s"rerank recall $reranked < plain ADC $plain")
  }

  test("ADC output is partition-invariant (exact integer sums, no FP order sensitivity)") {
    val qsub = sub.filter(col("vec_id") < 10)
      .withColumnRenamed("vec_id", "query_id")
    def run(e: org.apache.spark.sql.DataFrame) =
      Pq.adcTopK(Pq.encode(Pq.subvectors(e, "vec_id", "embedding", 8, 8), cb),
          qsub, cb, 5)
        .orderBy("query_id", "rank").collect().toSeq
    val base = run(emb)
    val reshuffled = run(emb.repartition(13, col("vec_id")))
    val single = run(emb.coalesce(1))
    assert(base === reshuffled)
    assert(base === single)
  }

  test("packed codes table: ~order-of-magnitude smaller on disk, and a cell-partitioned layout prunes probe reads") {
    def dirBytes(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    }
    val base = tmpDir("pqstore")
    // the stored ANN index: packed codes, partitioned by probe cell
    val codes = Pq.packCodes(Pq.encode(sub, cb))
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
    codes.write.partitionBy("label").parquet(s"$base/codes")
    emb.select(col("vec_id"), col("embedding")).write.parquet(s"$base/vectors")
    val codeBytes = new java.io.File(s"$base/codes").listFiles()
      .filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val vecBytes = dirBytes(s"$base/vectors")
    // 64 floats -> 8 small ints; random floats are incompressible,
    // codes dictionary-encode. Demand at least 8x on disk.
    assert(codeBytes * 8 <= vecBytes,
      s"codes $codeBytes not ~8x below vectors $vecBytes")
    // probing one cell must be partition pruning, not a full scan
    val probe = spark.read.parquet(s"$base/codes").filter(col("label") === 1)
    val scan = probe.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(label"), scan)
    def filesTouched(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val all = filesTouched(spark.read.parquet(s"$base/codes"))
    val probed = filesTouched(probe)
    assert(probed < all, s"probe touched $probed of $all files — no pruning")
  }

  test("adcTopK/rerankExact honor a non-default id column (matches the default run)") {
    val docs = emb.withColumnRenamed("vec_id", "doc_id")
    val sub2 = Pq.subvectors(docs, "doc_id", "embedding", 8, 8)
    val enc2 = Pq.encode(sub2, cb, idCol = "doc_id")
    val qsub2 = sub2.filter(col("doc_id") < 10)
      .withColumnRenamed("doc_id", "query_id")
    val renamed = Pq.adcTopK(enc2, qsub2, cb, 5, idCol = "doc_id")
      .orderBy("query_id", "rank").collect().toSeq
    val default = Pq.adcTopK(Pq.encode(sub, cb),
        sub.filter(col("vec_id") < 10).withColumnRenamed("vec_id", "query_id"),
        cb, 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(renamed === default)
    val rr = Pq.rerankExact(
      Pq.adcTopK(enc2, qsub2, cb, 10, idCol = "doc_id"),
      docs, docs.filter(col("doc_id") < 10), 3, idCol = "doc_id")
    assert(rr.count() > 0)
  }

  test("SQ8 per-dim distortion sits at the uniform-quantizer bound") {
    val rows = Pq.sq8DistortionReport(emb).collect()
    assert(rows.length === 64)
    rows.foreach { r =>
      val range = r.getDouble(3) - r.getDouble(2)
      val delta = range / 256.0
      val mse = r.getDouble(4)
      // midpoint reconstruction on a [min,max] grid: mse ≤ Δ²/4 always
      // (worst case at a cell edge), and near Δ²/12 for smooth data —
      // demand the hard bound and at least half the smooth bound so a
      // broken code/recon formula (wrong grid, off-by-one cell) fails
      assert(mse <= delta * delta / 4.0 + 1e-12, s"dim ${r.getInt(0)}: $mse")
      // the floor quantizes me2 at 1e-12 — only demand the smooth-data
      // floor where it dominates truncation (Δ² well above the quantum)
      if (delta > 1e-4)
        assert(mse >= delta * delta / 24.0, s"dim ${r.getInt(0)}: $mse suspiciously low")
    }
  }

  test("gated PQ plans stay product-free and broadcast the codebook side") {
    Seq("sim_knn_pq", "sim_knn_ivfpq", "sim_knn_pq_rerank",
        "sim_pq_distortion", "sim_sq8_distortion").foreach { name =>
      val plan = graft.queries.Inventory.byName(name)
        .run(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$name: $plan")
      assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
        s"$name plan lost its broadcast: $plan")
    }
  }
}
