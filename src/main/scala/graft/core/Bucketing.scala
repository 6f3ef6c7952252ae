package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed-table helpers: pre-shuffle a table ONCE at write time so every
  * later equi-join/aggregation on the bucket key runs shuffle-free.
  *
  * This is the 100 TB co-location strategy the builder prompt calls for:
  * a fact table joined daily on the same key pays one shuffle per day
  * unless it is stored bucketed — then `SortMergeJoin` reads both sides'
  * matching buckets directly (`BucketingSpec` asserts the Exchange nodes
  * are gone). Bucket counts must match (or divide) across join sides;
  * pick a count sized to target-partition bytes at the expected volume,
  * not to the cluster of the day.
  *
  * Spark persists bucket metadata only through the catalog
  * (`saveAsTable`), not path-based writes — so these helpers go through
  * the session catalog / warehouse dir.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table (overwrite). Sorting
    * within buckets additionally removes the join-side sort. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
}
