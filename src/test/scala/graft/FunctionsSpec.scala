package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Tables
import graft.queries.Inventory

/** Scalar/array-function coverage that the driver gate cannot carry.
  *
  * `x2_array_agg` is gated as a string-joined array because the driver's
  * canonicalizer only hashes scalar columns (a LIST column crashes its
  * pandas sort). The genuine nested-type contract — parquet LIST round
  * trip, deterministic sort order, agreement with the gated string form —
  * lives here instead.
  */
class FunctionsSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("x2: sorted event-type LIST survives a parquet round trip intact") {
    val listForm = Tables(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(
        sort_array(collect_list("event_type")).as("types"),
        count(lit(1)).as("n"))

    val out = tmpDir("x2-list")
    listForm.write.mode("overwrite").parquet(out)
    val back = spark.read.parquet(out)

    // schema: the nested type is a real ArrayType(StringType), not a
    // stringified rendering
    val typesField = back.schema("types")
    assert(typesField.dataType == ArrayType(StringType, containsNull = false)
      || typesField.dataType == ArrayType(StringType, containsNull = true))

    // values: round trip is lossless (sorted arrays are canonical, so
    // exceptAll in both directions works on the nested column)
    assert(back.exceptAll(listForm).isEmpty && listForm.exceptAll(back).isEmpty)
  }

  test("x2: gated string form IS array_join of the LIST form") {
    val listForm = Tables(spark, sfDir, "events")
      .groupBy("user_id")
      .agg(sort_array(collect_list("event_type")).as("types"),
        count(lit(1)).as("n"))
      .select(col("user_id"),
        array_join(col("types"), " ").as("types"), col("n"))

    val gated = Inventory.byName("x2_array_agg").run(spark, sfDir)
    assert(gated.schema("types").dataType == StringType)
    assert(gated.exceptAll(listForm).isEmpty && listForm.exceptAll(gated).isEmpty)
  }

  test("x2: sorted list is deterministic across shuffle partitionings") {
    val a = Tables(spark, sfDir, "events").repartition(3, col("event_id"))
      .groupBy("user_id").agg(sort_array(collect_list("event_type")).as("types"))
    val b = Tables(spark, sfDir, "events").repartition(7, col("value"))
      .groupBy("user_id").agg(sort_array(collect_list("event_type")).as("types"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
