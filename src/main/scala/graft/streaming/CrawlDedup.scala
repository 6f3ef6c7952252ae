package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** The daily-crawl dedup loop composed END-TO-END as one streaming job:
  * each micro-batch of new documents is LSH-probed against the persisted
  * corpus state, its near-dup pairs fold into the persisted cluster
  * labels, and the survivor set follows — the production composition of
  * the incremental-dedup matrix whose pieces
  * ([[graft.operators.Dedup.incrementalLshPairsFromBuckets]],
  * [[graft.operators.Dedup.incrementalConnectedComponents]]) are each
  * gated fold ≡ recompute separately.
  *
  * State layout under `stateDir` (all parquet, all writes keyed by
  * batchId so at-least-once re-delivery is idempotent by construction —
  * [[StreamingIvm]]'s versioned-fold protocol):
  *
  *   docs/batch=<b>/   the batch's documents  — APPEND-ONLY across
  *   bands/batch=<b>/  the batch's LSH band rows  batches; re-delivery
  *                     OVERWRITES its own subdir, readers filter
  *                     batch < current so a half-written re-delivery
  *                     target is never observed
  *   labels/v=<b>/     the FULL label state AFTER folding batch b —
  *                     batch b always folds the latest version
  *                     STRICTLY BELOW b (never its own possibly
  *                     half-written output), so re-running b recomputes
  *                     v=b from the same predecessor and input
  *
  * Per-batch cost is batch-proportional: the batch sketches map-side
  * (∝ batch tokens), candidate generation joins the batch's band rows
  * against the accumulated band state on (band, bh) — rows ∝ corpus
  * DOCUMENTS, never tokens — exact verification re-shingles only
  * candidate documents, and the label fold touches batch ids + roots of
  * touched clusters only. The corpus is never re-sketched, re-shingled,
  * or re-clustered. At 100 TB the docs/bands state is the lake's
  * bucketed band table ([[graft.operators.Dedup.writeLshIndex]]) plus
  * the corpus itself, with periodic compaction of the per-batch
  * partitions; the per-batch subdir layout here is the same algebra
  * with filesystem-idempotent appends.
  *
  * `maxBandBucketSize` rides through to the probe: the degenerate-bucket
  * fence matters MOST here, where one templated crawl batch would
  * otherwise quadratically funnel every later batch forever. */
object CrawlDedup {

  /** Accumulated state strictly BEFORE `beforeBatch` for an append-only
    * per-batch directory (`docs`/`bands`); None when no prior batch has
    * committed. */
  private def priorBatches(spark: SparkSession, dir: String,
                           beforeBatch: Long): Option[DataFrame] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return None
    val committed = fs.listStatus(p).toSeq
      .filter(st => st.getPath.getName.startsWith("batch=") &&
        fs.exists(new Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)
      .filter(_ < beforeBatch)
    if (committed.isEmpty) None
    else Some(spark.read
      .option("basePath", dir)
      .parquet(committed.map(b => s"$dir/batch=$b"): _*)
      .drop("batch"))
  }

  /** The foreachBatch body — public so tests can drive re-delivery
    * explicitly. Folds one batch of `(doc_id, text)` documents into
    * `stateDir`. */
  def applyBatch(spark: SparkSession, stateDir: String, n: Int,
                 threshold: Double, bands: Int = 16, rows: Int = 4,
                 maxBandBucketSize: Long = Long.MaxValue,
                 keepVersions: Int = 3)
                (batchDf: DataFrame, batchId: Long): Unit = {
    require(keepVersions >= 2,
      s"keepVersions must be >= 2 (re-delivery folds from the " +
        s"predecessor version), got $keepVersions")
    // materialize the batch once: it feeds the sketch, the verification
    // re-shingle, the label fold, AND the state append
    val batch = batchDf.select(col("doc_id"), col("text"))
      .localCheckpoint(true)
    // sketch ONCE: signatures feed the band rows (state append + probe)
    // and the first-batch intra pairing
    val sigs = Dedup.minhashSignatureArray(batch, n, bands * rows)
      .localCheckpoint(true)
    val batchBands = Dedup.lshBuckets(sigs, bands, rows)
    val priorDocs = priorBatches(spark, s"$stateDir/docs", batchId)
    val pairs = priorDocs match {
      case None =>
        // first batch: intra-batch LSH pairs only
        Dedup.minhashLshPairsFromSigs(batch, sigs, n, threshold, bands,
          rows, maxBandBucketSize)
      case Some(pd) =>
        Dedup.incrementalLshPairsFromBuckets(
          priorBatches(spark, s"$stateDir/bands", batchId).get, None,
          batchBands, pd, batch, n, threshold, maxBandBucketSize)
    }
    val prevLabels =
      StreamingIvm.readState(spark, s"$stateDir/labels", Some(batchId))
    val labels = prevLabels match {
      case None =>
        Dedup.connectedComponents(batch.select("doc_id"), "doc_id",
          pairs)
      case Some(pl) =>
        Dedup.incrementalConnectedComponents(pl, batch.select("doc_id"),
          "doc_id", pairs)
    }
    labels.localCheckpoint(true)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/labels/v=$batchId")
    val fs = new Path(stateDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new Path(s"$stateDir/labels/v=$batchId/_SUCCESS")),
      s"CrawlDedup: label state write v=$batchId produced no _SUCCESS " +
        "marker — the versioned-fold protocol cannot see commits " +
        "without markers")
    // state appends, each keyed by batchId (idempotent overwrite)
    batch.write.mode(SaveMode.Overwrite)
      .parquet(s"$stateDir/docs/batch=$batchId")
    batchBands.write.mode(SaveMode.Overwrite)
      .parquet(s"$stateDir/bands/batch=$batchId")
    // prune old label versions (full copies) — keep the just-written
    // one and at least its predecessor, like StreamingIvm; the docs/
    // bands per-batch partitions are DATA (not versioned copies) and
    // stay
    val lp = new Path(s"$stateDir/labels")
    val keep = StreamingIvm.versions(spark, s"$stateDir/labels")
      .takeRight(keepVersions).toSet
    fs.listStatus(lp).toSeq
      .filter(_.getPath.getName.startsWith("v="))
      .filter { st =>
        val v = st.getPath.getName.stripPrefix("v=").toLong
        !keep(v) && v < batchId
      }
      .foreach(st => fs.delete(st.getPath, true))
  }

  /** Current cluster labels (doc_id, cluster_id) — the latest committed
    * fold. */
  def labels(spark: SparkSession, stateDir: String): DataFrame =
    StreamingIvm.readState(spark, s"$stateDir/labels", None).getOrElse(
      sys.error(s"CrawlDedup: no committed label state under $stateDir"))

  /** Current survivor set: one document per near-dup cluster (the
    * cluster label IS the minimum member id, so survivors are the rows
    * labeling themselves). */
  def survivors(spark: SparkSession, stateDir: String): DataFrame =
    labels(spark, stateDir).filter(col("doc_id") === col("cluster_id"))
      .select("doc_id")

  /** Wire a document stream into the crawl fold. Caller starts the
    * returned writer with a checkpoint dir; restarts resume from the
    * checkpoint and the versioned state (kill-and-restart proven in
    * StreamingExtSuite). */
  def attach(docs: DataFrame, stateDir: String, n: Int, threshold: Double,
             bands: Int = 16, rows: Int = 4,
             maxBandBucketSize: Long = Long.MaxValue)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyBatch(b.sparkSession, stateDir, n, threshold, bands, rows,
          maxBandBucketSize)(b.toDF(), id)
    }
}
