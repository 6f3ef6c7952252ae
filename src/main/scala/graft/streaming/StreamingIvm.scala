package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.pipeline.IncrementalFinal

/** Streaming IVM: fold a CONTINUOUS signed changelog into persisted
  * per-key aggregate state — [[IncrementalFinal.maintainAggregate]]
  * driven by Structured Streaming's `foreachBatch`, with the state
  * protocol that survives failure re-delivery.
  *
  * The trap this module exists for: `foreachBatch` is AT-LEAST-once —
  * a crash between the state write and the checkpoint commit re-runs
  * the same (batchId, data), and a naive read-fold-overwrite applies
  * the delta TWICE. The fix is batchId-VERSIONED state:
  *
  *   - state lives in `stateDir/v=<batchId>/` (parquet);
  *   - batch b folds the latest version STRICTLY BELOW b — never
  *     "the latest", which on re-delivery is b's own possibly
  *     half-written output — and overwrites `v=b` deterministically;
  *   - re-running batch b therefore recomputes `v=b` from the same
  *     predecessor and the same input: idempotent by construction,
  *     whether the first attempt died before, during, or after its
  *     write.
  *
  * At 100 TB the same protocol holds with the state bucketed by key
  * ([[CdcApply.mergeIntoBucketedState]]'s layout) so each fold
  * touches only the buckets its delta hits; version directories are
  * then per-bucket manifests. Suite proves: multi-batch folding ≡
  * recompute, re-delivery idempotence, and restart-from-checkpoint
  * continuation on the surviving state. */
object StreamingIvm {

  /** Committed state versions (batch ids), ascending. */
  def versions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val p = new Path(stateDir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .sorted
  }

  /** The state as of the latest version strictly below `beforeBatch`
    * (all versions when None); empty schema-less None if no state. */
  def readState(spark: SparkSession, stateDir: String,
                beforeBatch: Option[Long] = None): Option[DataFrame] = {
    val vs = versions(spark, stateDir)
    val eligible = beforeBatch.fold(vs)(b => vs.filter(_ < b))
    eligible.lastOption.map(v => spark.read.parquet(s"$stateDir/v=$v"))
  }

  /** The foreachBatch body: fold `batch` (rows with `keyCols`, `sign`,
    * `v_micro`) into `stateDir` under the versioned protocol. Public
    * so tests can drive re-delivery explicitly. */
  def applyBatch(spark: SparkSession, stateDir: String,
                 keyCols: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val base = readState(spark, stateDir, Some(batchId)).getOrElse {
      // empty state with the maintenance schema
      batch.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(
          batch.select(keyCols.map(col): _*).schema.fields ++
            Seq(org.apache.spark.sql.types.StructField("cnt",
              org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("n_nonnull",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("sum_micro",
                org.apache.spark.sql.types.LongType))))
    }
    IncrementalFinal.maintainAggregate(base, batch, keyCols)
      // materialize BEFORE writing: the fold's lineage reads the
      // predecessor version, never the directory being overwritten,
      // but localCheckpoint also decouples from the streaming batch
      .localCheckpoint(true)
      .write.mode(SaveMode.Overwrite).parquet(s"$stateDir/v=$batchId")
  }

  /** Wire a changelog stream into the versioned fold. Caller starts
    * the returned writer with a checkpoint dir. */
  def attach(changelog: DataFrame, stateDir: String, keyCols: Seq[String])
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    changelog.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        applyBatch(batch.sparkSession, stateDir, keyCols)(batch.toDF(), id)
    }
}
