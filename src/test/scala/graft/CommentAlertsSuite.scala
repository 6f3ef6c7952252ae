package graft

import scala.collection.mutable

import graft.streaming.CommentAlerts

/** Comment-alert stream (mirrors reference slack_notifier/
  * slack_notification.py: structure checks, comment filter, message
  * assembly, delivery). */
class CommentAlertsSuite extends SparkSuite {

  test("batch projection: only comment-carrying valid events become alerts") {
    import spark.implicits._
    val lines = Seq(
      Fixtures.envelopeJson(1, 1, "Audrey", "Colin", 1713439245000000L,
        "Course à pied", Some(8000), 3100, Some("Super séance aujourd'hui !")),
      Fixtures.envelopeJson(2, 2, "A", "B", 1713439245000000L, "Yoga",
        None, 3600, None),               // no comment → dropped
      """{"payload": {"after": {"id": null}}}""", // invalid → dropped
      """garbage""")                     // unparseable → dropped
    val out = CommentAlerts.alerts(lines.toDF("value")).collect()
    assert(out.length === 1)
    val a = out.head
    assert(a.getAs[String]("author") === "Auteur: Audrey Colin")
    assert(a.getAs[String]("pretext") === "Super séance aujourd'hui !")
    assert(a.getAs[String]("text") === "Type d'activité: Course à pied")
  }

  test("streaming delivery runs on the executors and reaches the sink exactly once") {
    val in = tmpDir("alerts-in"); val cp = tmpDir("alerts-cp")
    Fixtures.writeCdcFixture(in) // 2 of the 5 valid events carry comments

    CollectingSink.received.synchronized { CollectingSink.received.clear() }
    val raw = spark.readStream.format("text").load(in)
      .withColumnRenamed("value", "value")
    CommentAlerts.run(spark, raw, CollectingSink, cp).awaitTermination()

    val got = CollectingSink.received.synchronized { CollectingSink.received.toList }
    assert(got.map(_.id).sorted === Seq(1, 3))
    assert(got.forall(_.author.startsWith("Auteur: ")))
  }

  test("run contains no driver-side collect: delivery happens inside foreachPartition") {
    // guard against regressing to batch.collect() in CommentAlerts.run —
    // the source is the contract here, not runtime behavior
    val src = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "src/main/scala/graft/streaming/CommentAlerts.scala")), "UTF-8")
    assert(!src.contains(".collect()"), "CommentAlerts.run must not collect to the driver")
    assert(src.contains("foreachPartition"))
  }
}

/** Top-level singleton: delivery happens on executor threads (local mode
  * = same JVM, different classloader path through the serialized task
  * closure) — a method-local object would be serialized BY VALUE and its
  * mutations lost; the Scala module's static MODULE$ field survives. */
private object CollectingSink extends CommentAlerts.AlertSink {
  val received: mutable.Buffer[CommentAlerts.Alert] = mutable.Buffer[CommentAlerts.Alert]()
  override def deliver(batch: Seq[CommentAlerts.Alert]): Unit =
    received.synchronized { received ++= batch }
}
