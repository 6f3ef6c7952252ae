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

  test("streaming delivery via foreachBatch reaches the sink exactly once") {
    val in = tmpDir("alerts-in"); val cp = tmpDir("alerts-cp")
    Fixtures.writeCdcFixture(in) // 2 of the 5 valid events carry comments

    val received = mutable.Buffer[CommentAlerts.Alert]()
    object CollectingSink extends CommentAlerts.AlertSink {
      override def deliver(batch: Seq[CommentAlerts.Alert]): Unit =
        received.synchronized { received ++= batch }
    }
    val raw = spark.readStream.format("text").load(in)
      .withColumnRenamed("value", "value")
    CommentAlerts.run(spark, raw, CollectingSink, cp).awaitTermination()

    assert(received.map(_.id).sorted === Seq(1, 3))
    assert(received.forall(_.author.startsWith("Auteur: ")))
  }
}
