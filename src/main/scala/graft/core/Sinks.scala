package graft.core

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

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
}
