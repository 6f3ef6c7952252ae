package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.plans.MvRegistry

/** The MV loop streamed end-to-end (VERDICT r15 task 3): one
  * `foreachBatch` job that keeps a ROUTED dashboard fresh over a live
  * insert stream — the reference's E1 streaming append
  * (`SaveDelta.scala:157-163`) joined to its E3 analytics, except the
  * dashboard query never rescans the corpus: each micro-batch
  *
  *   1. lands its rows as the corpus partition `docs/batch=<b>`
  *      (overwrite-own-subdir, so at-least-once re-delivery is
  *      idempotent — [[CrawlDedup]]'s append-only discipline),
  *   2. folds the batch's +1 changelog into the per-key summary under
  *      [[StreamingIvm.applyBatch]]'s batchId-versioned protocol
  *      (re-delivery re-folds from the same predecessor version —
  *      never from its own half-written output),
  *   3. re-registers the summary for the corpus path with a FRESH
  *      base-version token, so [[graft.plans.SummaryRewrite]] resumes
  *      routing plain aggregates over the corpus onto the |keys|-row
  *      summary.
  *
  * COMMIT ORDER is data-first (the versioned summary write is the
  * batch's commit mark, registration strictly after): a crash anywhere
  * leaves either a stale token or an unregistered summary, and both
  * make every candidate rewrite bail to the corpus scan — conservative,
  * never stale-serving. A restart loses the in-memory registry
  * entirely; queries scan the corpus until the first post-restart fold
  * re-registers. Deletes are not part of this loop by design: the
  * reference's CDC routes deletes to a tombstone table
  * ([[CdcIngest]]), and retraction-bearing summary repair is the batch
  * [[graft.pipeline.IncrementalFinal.refreshSummary]] path (gated
  * `cdc_mv_refresh_retraction`).
  *
  * At 100 TB: per batch the corpus write is ∝ batch, the fold is
  * |Δ keys|-proportional against |keys|-row state, and the dashboard
  * pays |keys| rows instead of the corpus — the whole point. The
  * plain-parquet corpus dir stands in for a lakehouse table (the
  * [[graft.core.Sinks]] Delta seam); snapshot isolation on the bail
  * path is what the Delta jar would add.
  */
object StreamingMv {

  /** The summary grain + maintained columns this loop serves:
    * count / non-null count / sum over `valueCol` at `keyCols` — the
    * [[graft.pipeline.IncrementalFinal.maintainAggregate]] contract —
    * plus MIN/MAX when `extremes` is set: monotone under the loop's
    * insert-only signs (a retraction fails the fold loudly — extreme
    * repair under deletes is the batch
    * [[graft.pipeline.IncrementalFinal.refreshSummary]] path). With
    * `distinctCol` set, the loop also maintains that column's distinct
    * hash-set sketch (exact under insert-only signs — set union
    * commutes with recompute) and registers it, so the routed dashboard
    * serves COUNT(DISTINCT distinctCol) from the |keys|-row summary;
    * retraction-bearing distinct repair is, like the extremes, the
    * batch refreshSummary path. */
  final case class Config(keyCols: Seq[String], valueCol: String = "v_micro",
                          keepVersions: Int = 3,
                          extremes: Boolean = false,
                          distinctCol: Option[String] = None)

  def docsDir(stateDir: String): String = s"$stateDir/docs"
  def summaryDir(stateDir: String): String = s"$stateDir/summary"

  /** The registered base path (registration and the routed query must
    * agree on it byte-for-byte). Qualified through the Hadoop
    * filesystem rather than a hardcoded "file:" prefix: with a
    * RELATIVE stateDir the literal prefix would register
    * "file:work/…" while the scan's rootPath resolves to
    * "file:/cwd/work/…" — the registry would never hit and every
    * dashboard would silently rescan the corpus forever; on a
    * non-local default filesystem the bogus file: path would crash the
    * fold's token stamp (review r18). makeQualified yields exactly the
    * string the scan's rootPath prints in both cases. */
  def basePath(spark: SparkSession, stateDir: String): String = {
    val p = new Path(docsDir(stateDir))
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.makeQualified(p).toString
  }

  /** The latest committed summary state, if any batch has folded. */
  def summary(spark: SparkSession, stateDir: String): Option[DataFrame] =
    StreamingIvm.readState(spark, summaryDir(stateDir))

  /** The foreachBatch body — public so tests can drive re-delivery and
    * crash windows explicitly. `batch` carries `keyCols` + `valueCol`
    * insert rows. */
  def foldBatch(spark: SparkSession, stateDir: String, cfg: Config)
               (batch: DataFrame, batchId: Long): Unit = {
    // 1. corpus partition first (re-delivery overwrites its own subdir;
    //    readers of the whole dir see at worst an extra not-yet-folded
    //    partition, which only matters on the bail path). The fold then
    //    reads the JUST-WRITTEN partition back (r18): the batch is
    //    evaluated exactly once — the write — and the corpus bytes and
    //    the folded delta are the same bytes by construction, which the
    //    old eager localCheckpoint only approximated while costing one
    //    extra materialization pass per fold.
    batch
      .select((cfg.keyCols.map(col) :+ col(cfg.valueCol)) ++
        cfg.distinctCol.filterNot(_ == cfg.valueCol).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${docsDir(stateDir)}/batch=$batchId")
    val rows = spark.read.parquet(s"${docsDir(stateDir)}/batch=$batchId")
    // 2. versioned summary fold — the commit mark
    // the IVM fold's maintenance schema is fixed (v_micro/sign); the
    // corpus partition above keeps the caller's column name — the
    // rename is a no-op for the default config
    StreamingIvm.applyBatch(spark, summaryDir(stateDir), cfg.keyCols,
      cfg.keepVersions, extremes = cfg.extremes,
      distinctCol = cfg.distinctCol.map(c =>
        if (c == cfg.valueCol) "v_micro" else c))(
      rows.withColumnRenamed(cfg.valueCol, "v_micro")
        .withColumn("sign", lit(1L)), batchId)
    // 3. routing resumes: register the folded summary for the corpus
    //    path with the CURRENT token (stamped from the files just
    //    written — any later corpus write bails routing until the next
    //    fold re-registers)
    MvRegistry.registerFresh(spark, basePath(spark, stateDir),
      MvRegistry.Summary(
        () => summary(spark, stateDir).getOrElse(
          sys.error(s"StreamingMv: no committed summary under $stateDir")),
        cfg.keyCols, "cnt",
        sums = Map(cfg.valueCol -> "sum_micro"),
        nns = Map(cfg.valueCol -> "n_nonnull"),
        mins = if (cfg.extremes) Map(cfg.valueCol -> "min_micro")
               else Map.empty,
        maxs = if (cfg.extremes) Map(cfg.valueCol -> "max_micro")
               else Map.empty,
        distincts = cfg.distinctCol.map(_ -> "kmv_distinct").toMap))
  }

  /** Wire an insert stream into the loop. Caller starts the returned
    * writer with a checkpoint dir. */
  def attach(inserts: DataFrame, stateDir: String, cfg: Config)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    inserts.writeStream.foreachBatch {
      (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        foldBatch(b.sparkSession, stateDir, cfg)(b.toDF(), id)
    }

  /** The dashboard query shape this loop keeps fresh: a PLAIN aggregate
    * over the corpus directory — [[graft.plans.SummaryRewrite]] decides
    * per query whether it serves from the summary (fresh) or the corpus
    * (stale/unregistered). */
  def dashboard(spark: SparkSession, stateDir: String, cfg: Config)
  : DataFrame = {
    val aggs = Seq(count(lit(1)).as("cnt"),
      count(col(cfg.valueCol)).as("n_nonnull"),
      sum(col(cfg.valueCol)).as("sum_micro"),
      avg(col(cfg.valueCol)).as("avg_micro")) ++
      (if (cfg.extremes)
        Seq(min(col(cfg.valueCol)).as("min_micro"),
          max(col(cfg.valueCol)).as("max_micro"))
      else Nil) ++
      cfg.distinctCol.map(c => countDistinct(col(c)).as("n_distinct"))
    spark.read.parquet(docsDir(stateDir))
      .groupBy(cfg.keyCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
