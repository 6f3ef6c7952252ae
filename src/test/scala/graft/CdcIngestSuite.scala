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

  test("op routing: deletes land in the tombstone path, inserts unaffected") {
    val in = tmpDir("cdc-in4"); val out = tmpDir("cdc-out4")
    val tomb = tmpDir("cdc-tomb4"); val cp = tmpDir("cdc-cp4")
    Fixtures.writeCdcFixture(in)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(in, "deletes.jsonl"),
      Fixtures.envelopeDeleteJson(3, 3, 1713446400000000L, "Vélo").getBytes("UTF-8"))

    CdcIngest.runRouted(spark, in, out, tomb, cp).awaitTermination()

    val inserts = spark.read.parquet(out)
    assert(inserts.count() === 5) // the 5 good events; delete not among them
    // the routed (beyond-parity) path carries ts_ms: CdcApply orders on it
    assert(inserts.schema.fieldNames.toSeq ===
      Seq("id", "id_employee", "start_datetime", "sport_type",
        "activity_duration", "distance", "comment", "ts_ms"))
    val dels = spark.read.parquet(tomb)
    assert(dels.count() === 1)
    val d = dels.head()
    assert(d.getAs[Int]("id") === 3) // row image came from payload.before
    assert(d.getAs[String]("start_datetime") === "2024-04-18 13:20:00")
  }

  test("the insert-only path still drops delete events (reference parity)") {
    import spark.implicits._
    val df = Seq(
      Fixtures.envelopeDeleteJson(7, 7, 1713439245000000L, "Judo"),
      Fixtures.envelopeJson(8, 8, "A", "B", 1713439245000000L, "Box", None, 60, None))
      .toDF("value")
    val parsed = CdcIngest.parseEnvelope(df).collect()
    assert(parsed.map(_.getAs[Int]("id")).toSeq === Seq(8))
    // while the change-log parse surfaces both, tagged by op
    val log = CdcIngest.parseChangeLog(df).collect()
      .map(r => r.getAs[String]("op") -> r.getAs[Int]("id")).toMap
    assert(log === Map("d" -> 7, "c" -> 8))
  }

  test("cdc apply: replayed routed output materializes current state, idempotently") {
    import graft.streaming.CdcApply
    val in = tmpDir("cdc-in5"); val out = tmpDir("cdc-out5")
    val tomb = tmpDir("cdc-tomb5"); val cp = tmpDir("cdc-cp5")
    def write(name: String, lines: String*): Unit =
      java.nio.file.Files.write(java.nio.file.Paths.get(in, name),
        lines.mkString("\n").getBytes("UTF-8"))
    // id 1: insert → delete (stays deleted); id 2: insert only;
    // id 3: insert → delete → RE-INSERT with a new image (the sequence
    // that breaks any business-timestamp ordering — ts_ms decides)
    write("inserts.jsonl",
      Fixtures.envelopeJson(1, 1, "A", "A", 1713439245000000L, "Yoga",
        None, 60, None, tsMs = 1000L),
      Fixtures.envelopeJson(2, 2, "B", "B", 1713439245000000L, "Marche",
        Some(4000), 30, None, tsMs = 1000L),
      Fixtures.envelopeJson(3, 3, "C", "C", 1713439245000000L, "Vélo",
        Some(25000), 45, None, tsMs = 1000L))
    write("deletes.jsonl",
      Fixtures.envelopeDeleteJson(1, 1, 1713439245000000L, "Yoga", tsMs = 2000L),
      Fixtures.envelopeDeleteJson(3, 3, 1713439245000000L, "Vélo", tsMs = 2500L))
    write("reinsert.jsonl",
      Fixtures.envelopeJson(3, 3, "C", "C", 1713439245000000L, "Judo",
        None, 90, None, tsMs = 3000L))
    CdcIngest.runRouted(spark, in, out, tomb, cp).awaitTermination()

    def state() = CdcApply.currentState(
      spark.read.parquet(out), spark.read.parquet(tomb),
      keyCols = Seq("id"), orderCols = Seq("ts_ms"))
    val cur = state().collect().map(r =>
      r.getAs[Int]("id") -> r.getAs[String]("sport_type")).toMap
    assert(cur === Map(2 -> "Marche", 3 -> "Judo"))

    // at-least-once replay: re-append the SAME batches (fresh checkpoint →
    // duplicate rows in both tables); the materialized state is unchanged
    CdcIngest.runRouted(spark, in, out, tomb, tmpDir("cdc-cp5b")).awaitTermination()
    val replayed = state().collect().map(r =>
      r.getAs[Int]("id") -> r.getAs[String]("sport_type")).toMap
    assert(replayed === cur)
  }

  test("applyBatch: folding a new batch into materialized state ≡ replaying the full changelog") {
    import spark.implicits._
    import graft.streaming.CdcApply
    def df(rows: (Int, String, Long)*) = rows.toDF("id", "sport_type", "ts_ms")
    // epoch 1: inserts 1,2,3; delete 2
    val ups1 = df((1, "Yoga", 1000L), (2, "Marche", 1000L), (3, "Vélo", 1000L))
    val del1 = df((2, "Marche", 2000L))
    val state1 = CdcApply.currentState(ups1, del1, Seq("id"), Seq("ts_ms"))
    // epoch 2 (all later than epoch 1): update 1, delete 3, re-insert 2
    val ups2 = df((1, "Judo", 3000L), (2, "Box", 3500L))
    val del2 = df((3, "Vélo", 3200L))
    val folded = CdcApply
      .applyBatch(state1, ups2, del2, Seq("id"), Seq("ts_ms"))
      .select("id", "sport_type").as[(Int, String)].collect().toSet
    val replayed = CdcApply
      .currentState(ups1.unionByName(ups2), del1.unionByName(del2),
        Seq("id"), Seq("ts_ms"))
      .select("id", "sport_type").as[(Int, String)].collect().toSet
    assert(folded === replayed)
    assert(folded === Set(1 -> "Judo", 2 -> "Box"))
  }

  test("bucketed state merge: touched buckets only; deletes remove rows; emptied buckets vanish") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{pmod, xxhash64, lit => flit}
    import graft.streaming.CdcApply
    def df(rows: (Int, String, Long)*) = rows.toDF("id", "sport_type", "ts_ms")
    val none = Seq.empty[(Int, String, Long)].toDF("id", "sport_type", "ts_ms")
    val statePath = tmpDir("cdc-state")
    val nb = 8

    // batch 1 seeds the table
    CdcApply.mergeIntoBucketedState(
      df((1, "Yoga", 1000L), (2, "Marche", 1000L), (3, "Vélo", 1000L), (4, "Box", 1000L)),
      none, Seq("id"), Seq("ts_ms"), statePath, nb)
    def state() = CdcApply.readState(spark, statePath)
      .select("id", "sport_type").as[(Int, String)].collect().toSet
    assert(state() === Set(1 -> "Yoga", 2 -> "Marche", 3 -> "Vélo", 4 -> "Box"))

    // which bucket each id lives in (the operator's own layout rule)
    val bucketOf = Seq(1, 2, 3, 4).toDF("id")
      .select(col("id"), pmod(xxhash64(col("id")), flit(nb)).as("b"))
      .as[(Int, Long)].collect().toMap
    def files(b: Long) = {
      val d = new java.io.File(statePath, s"__graft_bucket=$b")
      if (!d.exists()) Map.empty[String, Long]
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified).toMap
    }
    val untouchedBuckets = Seq(2, 4).map(bucketOf) // batch 2 touches ids 1 and 3
      .filterNot(Seq(1, 3).map(bucketOf).contains).distinct
    val before = untouchedBuckets.map(b => b -> files(b)).toMap

    // batch 2: update id 1, delete id 3
    CdcApply.mergeIntoBucketedState(
      df((1, "Judo", 2000L)), df((3, "Vélo", 2000L)),
      Seq("id"), Seq("ts_ms"), statePath, nb)
    assert(state() === Set(1 -> "Judo", 2 -> "Marche", 4 -> "Box"))
    untouchedBuckets.foreach(b =>
      assert(files(b) === before(b), s"bucket $b rewritten without its keys in the batch"))

    // batch 3: delete EVERYTHING — emptied buckets must not leave stale rows
    CdcApply.mergeIntoBucketedState(
      none, df((1, "Judo", 3000L), (2, "Marche", 3000L), (4, "Box", 3000L)),
      Seq("id"), Seq("ts_ms"), statePath, nb)
    assert(state() === Set.empty)
  }

  test("scd2 history: next change closes each version; a trailing delete leaves no current row") {
    import spark.implicits._
    import graft.streaming.CdcApply
    // id 3: upsert(1000) → delete(2000) → re-insert(3000): two versions,
    //       the first closed BY THE DELETE, the second current
    // id 2: one upsert → one open version
    // id 1: delete only → no versions at all
    val ups = Seq((3, "Vélo", 1000L), (3, "Judo", 3000L), (2, "Marche", 1000L))
      .toDF("id", "sport_type", "ts_ms")
    val dels = Seq((3, "Vélo", 2000L), (1, "Yoga", 500L))
      .toDF("id", "sport_type", "ts_ms")
    val hist = CdcApply
      .scd2History(ups, dels, Seq("id"), Seq("ts_ms"), tsCol = "ts_ms")
      .select("id", "sport_type", "valid_from", "valid_to", "is_current")
      .as[(Int, String, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._3)).toSeq
    assert(hist === Seq(
      (2, "Marche", 1000L, None, true),
      (3, "Vélo", 1000L, Some(2000L), false),
      (3, "Judo", 3000L, None, true)))
    // and the current slice of the history ≡ currentState of the same log
    val histCurrent = CdcApply
      .scd2History(ups, dels, Seq("id"), Seq("ts_ms"), tsCol = "ts_ms")
      .filter(col("is_current")).select("id", "sport_type")
      .as[(Int, String)].collect().toSet
    val state = CdcApply.currentState(ups, dels, Seq("id"), Seq("ts_ms"))
      .select("id", "sport_type").as[(Int, String)].collect().toSet
    assert(histCurrent === state)
  }

  test("stateAt: AS-OF lookups replay upsert → delete → re-insert correctly") {
    import spark.implicits._
    import graft.streaming.CdcApply
    // same changelog as the scd2 case; probe four instants around it
    val ups = Seq((3, "Vélo", 1000L), (3, "Judo", 3000L), (2, "Marche", 1000L))
      .toDF("id", "sport_type", "ts_ms")
    val dels = Seq((3, "Vélo", 2000L), (1, "Yoga", 500L))
      .toDF("id", "sport_type", "ts_ms")
    def at(t: Long) = CdcApply
      .stateAt(ups, dels, Seq("id"), Seq("ts_ms"), "ts_ms", lit(t))
      .select("id", "sport_type").as[(Int, String)].collect().toSet
    assert(at(999L) === Set.empty)                           // before anything
    assert(at(1500L) === Set(3 -> "Vélo", 2 -> "Marche"))    // both live
    assert(at(2500L) === Set(2 -> "Marche"))                 // 3 deleted at 2000
    assert(at(3000L) === Set(3 -> "Judo", 2 -> "Marche"))    // re-inserted
    // AS-OF "now" ≡ currentState
    val state = CdcApply.currentState(ups, dels, Seq("id"), Seq("ts_ms"))
      .select("id", "sport_type").as[(Int, String)].collect().toSet
    assert(at(Long.MaxValue) === state)
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe on values") {
    import spark.implicits._
    import graft.streaming.CdcApply
    val old = Seq(
      (1L, Option("a"), Option(1.0)),  // unchanged
      (2L, Option("b"), Option.empty[Double]), // unchanged, null value
      (3L, Option("c"), Option(3.0)),  // changed value
      (4L, Option.empty[String], Option(4.0))) // removed
      .toDF("id", "name", "v")
    val nw = Seq(
      (1L, Option("a"), Option(1.0)),
      (2L, Option("b"), Option.empty[Double]),
      (3L, Option("c"), Option(3.5)),
      (5L, Option("e"), Option(5.0))) // added
      .toDF("id", "name", "v")
    val got = CdcApply.snapshotDiff(old, nw, Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "unchanged", 2L -> "unchanged",
      3L -> "changed", 4L -> "removed", 5L -> "added"))
    // null → value flips count as changed (null-safe compare, not =)
    val flip = CdcApply.snapshotDiff(
      Seq((2L, Option.empty[Double])).toDF("id", "v"),
      Seq((2L, Some(9.0))).toDF("id", "v"), Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(flip === Map(2L -> "changed"))
    // columns present on only one side are ignored (schema migration)
    val mig = CdcApply.snapshotDiff(
      Seq((1L, "x", 10L)).toDF("id", "v", "legacy"),
      Seq((1L, "x", true)).toDF("id", "v", "flag"), Seq("id"))
      .as[(Long, String)].collect().toMap
    assert(mig === Map(1L -> "unchanged"))
    // null-keyed rows never match: one per side → removed + added, and
    // neither masquerades as the other side's row
    val nk = CdcApply.snapshotDiff(
      Seq((Option.empty[Long], "o")).toDF("id", "v"),
      Seq((Option.empty[Long], "n")).toDF("id", "v"), Seq("id"))
      .select("status").as[String].collect().sorted
    assert(nk === Array("added", "removed"))
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

  test("schemaDriftAudit flags unknown image fields; widening the schema adopts them") {
    import spark.implicits._
    val known =
      """{"payload": {"after": {"id": 1, "id_employee": 1, "sport_type": "Yoga"}, "op": "c"}}"""
    val driftedUpsert =
      """{"payload": {"after": {"id": 2, "id_employee": 2, "sport_type": "Vélo", "device_id": "w-17"}, "op": "u"}}"""
    val driftedDelete =
      """{"payload": {"before": {"id": 3, "id_employee": 3, "heart_rate": 140, "device_id": "w-9"}, "op": "d"}}"""
    val garbage = """not-json-at-all"""
    val raw = Seq(known, driftedUpsert, driftedDelete, garbage).toDF("value")

    val audit = CdcIngest.schemaDriftAudit(raw)
      .orderBy("unknown_keys")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // deletes audit their before-image; unknown keys are sorted;
    // conforming and unparseable records never reach the aggregate
    assert(audit === Array(("device_id", 1L), ("device_id,heart_rate", 1L)))

    // the adoption half: widen the declared image schema and reparse —
    // the new column materializes, old records read null (the parquet
    // mergeSchema semantics, end to end through the envelope)
    val widened = new org.apache.spark.sql.types.StructType(
      (graft.core.Schemas.debeziumAfter.fields :+
        org.apache.spark.sql.types.StructField("device_id",
          org.apache.spark.sql.types.StringType)))
    val env = new org.apache.spark.sql.types.StructType()
      .add("payload", new org.apache.spark.sql.types.StructType()
        .add("after", widened).add("op",
          org.apache.spark.sql.types.StringType))
    val re = raw
      .select(from_json(col("value"), env).as("e"))
      .select(col("e.payload.after.id").as("id"),
        col("e.payload.after.device_id").as("device_id"))
      .filter(col("id").isNotNull)
      .orderBy("id")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(re === Array((1, null), (2, "w-17")))
  }
}
