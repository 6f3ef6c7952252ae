package graft

import org.apache.spark.sql.functions._

import graft.streaming.CdcIngest

/** E1 streaming CDC ingest (mirrors reference spark/SaveDelta.scala). */
class CdcIngestSuite extends SparkSuite {

  test("ingests Debezium envelopes, drops malformed/null-id events") {
    val in = tmpDir("cdc-in"); val out = tmpDir("cdc-out"); val cp = tmpDir("cdc-cp")
    Fixtures.writeCdcFixture(in)

    CdcIngest.run(spark, in, out, cp).awaitTermination()

    val result = spark.read.parquet(out)
    assert(result.count() === 5) // 7 lines - null-id - malformed
    assert(result.schema.fieldNames.toSeq ===
      Seq("id", "id_employee", "start_datetime", "sport_type",
        "activity_duration", "distance", "comment"))
  }

  test("start_datetime keeps the reference's string semantics (µs epoch → UTC string)") {
    val in = tmpDir("cdc-in2"); val out = tmpDir("cdc-out2"); val cp = tmpDir("cdc-cp2")
    Fixtures.writeCdcFixture(in)
    CdcIngest.run(spark, in, out, cp).awaitTermination()

    val row = spark.read.parquet(out).filter(col("id") === 1)
      .select("start_datetime", "distance").head()
    // 1713439245000000 µs = 2024-04-18 11:20:45 UTC; column is a STRING
    assert(row.getString(0) === "2024-04-18 11:20:45")
    // int distance arrives as double (SaveDelta.scala:146 drift)
    assert(row.getDouble(1) === 8000.0)
  }

  test("checkpoint makes re-runs exactly-once (no duplicate appends)") {
    val in = tmpDir("cdc-in3"); val out = tmpDir("cdc-out3"); val cp = tmpDir("cdc-cp3")
    Fixtures.writeCdcFixture(in)
    CdcIngest.run(spark, in, out, cp).awaitTermination()
    CdcIngest.run(spark, in, out, cp).awaitTermination() // same checkpoint
    assert(spark.read.parquet(out).count() === 5)
  }

  test("batch parse of the same plan handles all-null comment rows") {
    import spark.implicits._
    val df = Seq(
      Fixtures.envelopeJson(9, 9, "A", "B", 1713439245000000L, "Box", None, 60, None))
      .toDF("value")
    val parsed = CdcIngest.parseEnvelope(df).head()
    assert(parsed.getAs[Any]("distance") === null)
    assert(parsed.getAs[Any]("comment") === null)
  }
}
