package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Multi-dimensional data layout: Morton (Z-order) keys and the z-sorted
  * write — the file-skipping complement to [[Bucketing]]'s co-location.
  *
  * A single-column sort clusters ONE predicate dimension; a z-sorted
  * layout interleaves the bits of two dimensions so that a range filter
  * on EITHER column maps to a bounded set of z-ranges — parquet min/max
  * stats then skip most files for 2-D slices (ZOrderSpec measures both
  * layouts on the same grid). This is the layout trick behind Delta's
  * OPTIMIZE ZORDER BY, built here from plain bit algebra — at 100 TB
  * the write becomes the compaction job, and every (x, y) slice query
  * afterwards reads ~√(selectivity) of the files instead of all of them.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of two non-negative
    * integer columns (x on even positions, y on odd). Pure codegen'd
    * bit algebra — `2·bits` shifts and ORs, no UDF. Callers pick `bits`
    * to cover their value range (values ≥ 2^bits fold onto the low
    * bits: correct as a hash-like key, but range pruning then weakens —
    * size bits to the domain). */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val xl = x.cast(LongType)
    val yl = y.cast(LongType)
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB-equivalent SQL for [[zValue]] — generated, so the oracle
    * and the Spark expression stay in lockstep by construction. */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((CAST($x AS BIGINT) >> $i) & 1) << ${2 * i}) | " +
        s"(((CAST($y AS BIGINT) >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" | ")

  /** Z-ordered parquet layout: range-partition by the z-key into `files`
    * files, sorted within each — every file then owns one contiguous
    * z-range, which is what makes min/max stats selective for filters
    * on either source column. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
                    files: Int, dir: String): Unit = {
    // an unlikely internal name: a user column called "zkey" must survive
    // the round trip, not be overwritten by the layout key
    val zk = "__graft_zkey"
    require(!df.columns.contains(zk), s"input already has a $zk column")
    df.withColumn(zk, zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col(zk))
      .sortWithinPartitions(zk)
      // the layout key is an implementation detail — project it away so
      // the output schema matches the input (OPTIMIZE ZORDER BY parity);
      // file skipping needs only the source columns' min/max stats
      .select(df.columns.toIndexedSeq.map(col): _*)
      .write.mode("overwrite").parquet(dir)
  }

  /** Execute the compaction plan (`cur_compaction_plan`'s bin
    * assignment): pack rows into target-sized bins per `groupCol` by a
    * prefix sum of `sizeCol` in `orderCol` order, then write ONE file
    * per (group, bin) — the small-files rewrite an OPTIMIZE job runs.
    * The window shuffle IS the plan; `repartition(group, bin)`
    * co-locates each bin into a single task, so every partition
    * directory holds exactly one file. First-fit bound: a bin's payload
    * never exceeds `targetPerBin` + one row's size. */
  def writeCompacted(df: DataFrame, groupCol: String, orderCol: String,
                     sizeCol: String, targetPerBin: Long, dir: String): Unit = {
    require(targetPerBin > 0, s"targetPerBin must be positive, got $targetPerBin")
    val cum = "__graft_cum"; val bin = "__graft_bin"
    require(!df.columns.contains(cum) && !df.columns.contains(bin),
      s"input already has a $cum/$bin column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(Long.MinValue, -1)
    df.withColumn(cum, coalesce(sum(col(sizeCol)).over(w), lit(0L)))
      .withColumn(bin, expr(s"$cum DIV $targetPerBin"))
      .drop(cum)
      .repartition(col(groupCol), col(bin))
      .write.mode("overwrite")
      .partitionBy(groupCol, bin)
      .parquet(dir)
  }

  /** Detection side of the compaction loop: per partition directory, the
    * file count, how many fall below `smallBytes`, and total bytes —
    * the report that decides WHICH partitions [[writeCompacted]] (or an
    * OPTIMIZE job) should rewrite. Pure filesystem-metadata listing (no
    * data read); the result is |partitions| rows however large the
    * table. Non-partitioned layouts report one "" partition. */
  def smallFilesReport(spark: org.apache.spark.sql.SparkSession, dir: String,
                       smallBytes: Long): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val it = fs.listFiles(root, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val st = it.next()
      val name = st.getPath.getName
      if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_")) {
        val rel = root.toUri.relativize(st.getPath.getParent.toUri).getPath
        files += ((rel.stripSuffix("/"), st.getLen))
      }
    }
    files.toSeq.toDF("partition", "bytes")
      .groupBy("partition")
      .agg(count(lit(1)).as("n_files"),
        count(when(col("bytes") < smallBytes, 1)).as("n_small"),
        sum(col("bytes")).as("bytes_total"))
      .orderBy("partition")
  }
}
