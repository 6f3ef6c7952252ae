package graft.core

import java.nio.charset.StandardCharsets
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Batch sink constructors (SURVEY §2.2). The streaming sinks live with
  * their pipelines ([[graft.streaming.CdcIngest.appendSink]] = K1,
  * [[graft.streaming.CommentAlerts]] = K6, [[graft.streaming.Monitor]] =
  * K7); these are the batch writers.
  *
  * Scale notes:
  *   - K2 overwrite is the reference's nightly full rewrite of `final`
  *     (`read_delta.py:217-222`). Kept for parity; `partitionBy` turns it
  *     into partition-granular overwrite, which is the 100 TB form
  *     (rewrite only the day/BU you recomputed, not the table).
  *   - K5 JDBC append is `df.write.jdbc` — batched inserts from
  *     executors, replacing the reference's driver-side psycopg2
  *     execute_values loop (`sql_manipulation.py:119-124`).
  */
object Sinks {

  /** K2: full-overwrite batch write (read_delta.py:217-222), optionally
    * partitioned — pass partition columns at scale so overwrites become
    * partition-granular and downstream scans prune. */
  def overwrite(df: DataFrame, path: String, format: String = "parquet",
                partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.format(format).mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** Append-mode batch write (the batch twin of the K1 streaming sink). */
  def append(df: DataFrame, path: String, format: String = "parquet",
             partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.format(format).mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** K3: CSV overwrite probe (SaveDelta.scala:64-69). */
  def csv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  /** K4: text write (SaveDelta.scala:52 uses the RDD API; the Dataset
    * writer is the supported path). Input must be a single string column. */
  def text(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).text(path)

  /** K5: bulk JDBC append (sql_manipulation.py:119-124). */
  def jdbcAppend(df: DataFrame, url: String, table: String,
                 props: Properties): Unit =
    df.write.mode(SaveMode.Append).jdbc(url, table, props)

  /** Per-file (n_rows, checksum) over a written parquet dataset —
    * checksum = Σ md5-row-digest 60-bit prefixes in DECIMAL(38,0) mod
    * 2⁶¹−1, order-free (the q11 discipline applied per shard). The row
    * digest renders rows via to_json(struct(*)), which is stable WITHIN
    * this engine — manifests verify our own written data, they are not
    * a cross-engine contract. One scan, partial aggs per file. */
  private def fileDigests(spark: SparkSession, dir: String): DataFrame = {
    val d38 = DecimalType(38, 0)
    val data = spark.read.parquet(dir)
    data
      .select(input_file_name().as("file"),
        conv(substring(md5(to_json(struct(data.columns.toIndexedSeq.map(col): _*))), 1, 15),
          16, 10).cast(LongType).cast(d38).as("h"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"), sum(col("h")).as("hsum"))
      .select(col("file"), col("n_rows"),
        expr("CAST(hsum % 2305843009213693951 AS BIGINT)").as("checksum"))
  }

  /** Publish-a-dataset write: parquet shards range-partitioned on
    * `sortCol` (stable shard contents under re-runs) plus a
    * `_manifest.json` recording each shard file's row count and
    * order-free checksum — the artifact a consumer uses to prove a copy
    * is complete and uncorrupted without re-reading the producer's data.
    * The manifest is written AFTER the data commits, from a re-read of
    * the written files — it describes what is actually on disk, not
    * what the writer intended. */
  def writeWithManifest(df: DataFrame, dir: String, shards: Int,
                        sortCol: String): Unit = {
    df.repartitionByRange(shards, col(sortCol))
      .write.mode(SaveMode.Overwrite).parquet(dir)
    val spark = df.sparkSession
    // JSON-escape the file name (quote/backslash/control chars) — the
    // verifier parses the manifest with a real JSON parser, so raw
    // interpolation is a format hazard even if Spark part-file names
    // are safe today (ADVICE r9)
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val entries = fileDigests(spark, dir).orderBy("file")
      .collect() // |shards| rows — a control-plane readout
      .map { r =>
        val name = r.getString(0).split('/').last
        s"""{"file":${jstr(name)},"n_rows":${r.getLong(1)},"checksum":${r.getLong(2)}}"""
      }
    val manifest = entries.mkString("[\n  ", ",\n  ", "\n]\n")
    val p = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(manifest.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Re-derive every shard's (n_rows, checksum) and compare against the
    * stored `_manifest.json`: rows = (file, ok, reason). A consumer runs
    * this after copying a published dataset; any corrupt, missing, or
    * extra shard surfaces by name. */
  def verifyManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new org.apache.hadoop.fs.Path(dir, "_manifest.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text = try {
      val bytes = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      in.readFully(bytes); new String(bytes, StandardCharsets.UTF_8)
    } finally in.close()
    val expected = Seq(text).toDS()
      .select(explode(from_json(col("value"), lit(
        "array<struct<file:string,n_rows:bigint,checksum:bigint>>"))).as("e"))
      .select("e.*")
    val actual = fileDigests(spark, dir)
      .withColumn("file", element_at(split(col("file"), "/"), -1))
    actual.as("a").join(expected.as("m"), Seq("file"), "full_outer")
      .select(col("file"),
        (col("a.n_rows") <=> col("m.n_rows") &&
          col("a.checksum") <=> col("m.checksum")).as("ok"),
        when(col("a.n_rows").isNull, lit("missing shard"))
          .when(col("m.n_rows").isNull, lit("not in manifest"))
          .when(!(col("a.n_rows") <=> col("m.n_rows")), lit("row count"))
          .when(!(col("a.checksum") <=> col("m.checksum")), lit("checksum"))
          .otherwise(lit("ok")).as("reason"))
  }
}
