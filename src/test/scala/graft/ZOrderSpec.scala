package graft

import org.apache.spark.sql.functions._

import graft.core.Layout

/** Z-order layout semantics + the measured file-skipping payoff that
  * justifies it at 100 TB. */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("writeCompacted: one file per planned bin, nothing lost, first-fit size bound") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "n_chars")
    val target = 2000L
    val out = tmpDir("compact")
    Layout.writeCompacted(docs, "source", "doc_id", "n_chars", target, out)

    val back = spark.read.parquet(out)
    assert(back.count() === docs.count(), "compaction must not drop rows")

    // one physical file per (source, bin) partition directory
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(out))
      .filter(p => p.toString.endsWith(".parquet")).toArray.map(_.toString)
    val bins = back.select("source", "__graft_bin").distinct().count()
    assert(files.length === bins.toInt,
      s"${files.length} files for $bins planned bins")
    assert(bins > docs.select("source").distinct().count(),
      "target must be small enough that sources split into multiple bins")

    // first-fit bound: no bin exceeds target + its largest single row
    val over = back.groupBy("source", "__graft_bin")
      .agg(sum("n_chars").as("tot"), max("n_chars").as("mx"))
      .filter(col("tot") > lit(target) + col("mx"))
      .count()
    assert(over === 0L)
  }

  test("smallFilesReport flags a fragmented partition; compaction clears it") {
    val docs = graft.core.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "source", "n_chars")
    // fragment: 8 files per source partition
    val frag = tmpDir("frag")
    docs.repartition(8).write.mode("overwrite").partitionBy("source").parquet(frag)
    val before = Layout.smallFilesReport(spark, frag, smallBytes = 1L << 20)
      .collect()
    assert(before.nonEmpty)
    assert(before.forall(r => r.getAs[Long]("n_files") >= 2 &&
      r.getAs[Long]("n_small") === r.getAs[Long]("n_files")),
      s"every partition should be fragmented into small files: ${before.toSeq}")
    // the fix: compact (everything lands in few large-enough-per-bin files)
    val fixed = tmpDir("frag-fixed")
    Layout.writeCompacted(docs, "source", "doc_id", "n_chars",
      targetPerBin = 1L << 20, fixed)
    val after = Layout.smallFilesReport(spark, fixed, smallBytes = 1L << 20)
      .collect()
    // one bin per source at this target → exactly one file per partition
    assert(after.forall(_.getAs[Long]("n_files") === 1L),
      s"compaction should leave one file per partition: ${after.toSeq}")
    // nothing lost along the way
    assert(spark.read.parquet(fixed).count() === docs.count())
  }

  test("zValue interleaves bits (hand-checked corners and a reference fold)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (63L, 63L))
      .toDF("x", "y")
      .withColumn("z", Layout.zValue(col("x"), col("y"), 8))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(z((0L, 0L)) === 0L)
    assert(z((1L, 0L)) === 1L) // x occupies even bit positions
    assert(z((0L, 1L)) === 2L) // y occupies odd bit positions
    // reference morton interleave in plain Scala
    def morton(x: Long, y: Long): Long =
      (0 until 8).foldLeft(0L)((acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
    assert(z((3L, 5L)) === morton(3L, 5L))
    assert(z((63L, 63L)) === morton(63L, 63L))
  }

  test("generated oracle SQL mirrors the Spark expression bit for bit") {
    // run the generated SQL through Spark itself: same engine-agnostic
    // bit algebra, so any drift between the two formulations surfaces
    val df = (0L until 64L).map(i => (i % 8, i / 8)).toDF("x", "y")
    df.createOrReplaceTempView("zsrc")
    val viaSql = spark.sql(
      s"SELECT x, y, ${Layout.zValueSql("x", "y", 6)} AS z FROM zsrc")
    val viaCol = df.select(col("x"), col("y"),
      Layout.zValue(col("x"), col("y"), 6).as("z"))
    assert(viaSql.except(viaCol).isEmpty && viaCol.except(viaSql).isEmpty)
  }

  test("a y-only slice reads far fewer files from a z-sorted layout than an x-sorted one") {
    // 64×64 grid, 16 files per layout. A filter on y alone defeats an
    // x-sorted layout completely (every file holds all y values) while
    // the z-layout confines y < 8 to the blocks whose odd high bits are
    // zero — the 2-D locality the z-curve buys.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x, y)))
      .toDF("x", "y")
    val zDir = tmpDir("zorder")
    val xDir = tmpDir("xsort")
    Layout.writeZOrdered(grid, "x", "y", bits = 6, files = 16, zDir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def filesTouched(dir: String): Long =
      spark.read.parquet(dir).filter(col("y") < 8)
        .select(input_file_name()).distinct().count()

    val zFiles = filesTouched(zDir)
    val xFiles = filesTouched(xDir)
    // matching rows concentrate in ≤ 1/2 of z-files; x-sort spreads them
    // over (almost) every file
    assert(zFiles <= 8, s"z-layout touched $zFiles of 16 files")
    assert(xFiles >= 12, s"x-sort should spread y-slices, touched only $xFiles")
    assert(zFiles < xFiles)
    // and both layouts return the identical rows
    assert(spark.read.parquet(zDir).filter(col("y") < 8).count()
      === spark.read.parquet(xDir).filter(col("y") < 8).count())
    // the layout key is an implementation detail: output schema = input
    assert(spark.read.parquet(zDir).columns.sorted === Array("x", "y"))
  }

  test("a user column named zkey survives the z-ordered write untouched") {
    val df = (0 until 32).map(i => (i % 8, i / 8, s"payload$i"))
      .toDF("x", "y", "zkey")
    val dir = tmpDir("zorder-usercol")
    Layout.writeZOrdered(df, "x", "y", bits = 3, files = 4, dir)
    val back = spark.read.parquet(dir)
    assert(back.columns.sorted === Array("x", "y", "zkey"))
    // values round-trip: zkey still holds the user's strings, not Morton keys
    assert(back.select("x", "y", "zkey").as[(Int, Int, String)].collect().toSet
      === df.as[(Int, Int, String)].collect().toSet)
  }
}
