package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Sinks, Sources}
import graft.quality.Checks

/** Source/sink constructors (SURVEY §2.1–§2.2) that are testable without
  * external services: CSV-with-schema (S5), rate fallback (S2), batch
  * overwrite/append incl. partitioned form (K2), CSV/text probes (K3/K4),
  * catalog introspection (S8). JDBC (S4/K5) has no server here; its
  * constructors are exercised at the API-shape level by compilation. */
class SourcesSinksSuite extends SparkSuite {

  import spark.implicits._

  private val hrSchema = StructType(Seq(
    StructField("id_employee", IntegerType),
    StructField("first_name", StringType),
    StructField("gross_salary", IntegerType)))

  test("S5: CSV scan with explicit schema (no inference) round-trips") {
    val dir = tmpDir("csv-src")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "hr.csv"),
      "id_employee,first_name,gross_salary\n1,Ada,52000\n2,Grace,61000\n".getBytes)
    val df = Sources.csv(spark, dir, hrSchema)
    assert(df.schema === hrSchema)
    assert(df.orderBy("id_employee").collect().map(_.getInt(2)).toSeq === Seq(52000, 61000))
  }

  test("S2: rate fallback presents the Kafka key/value string contract") {
    val df = Sources.rateFallback(spark)
    assert(df.isStreaming)
    assert(df.schema.fieldNames.toSeq === Seq("key", "value"))
    assert(df.schema.fields.forall(_.dataType == StringType))
  }

  test("K2: partitioned overwrite prunes on the partition key when read back") {
    val out = tmpDir("k2-out")
    val df = Seq((1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0))
      .toDF("id", "bu", "v")
    Sinks.overwrite(df, out, partitionBy = Seq("bu"))
    // partition directories exist → a bu='A' read touches only bu=A files
    assert(new java.io.File(out, "bu=A").exists())
    assert(new java.io.File(out, "bu=B").exists())
    val back = spark.read.parquet(out).filter(col("bu") === "A")
    assert(back.count() === 2)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)

    // overwrite is idempotent: same write, same contents
    Sinks.overwrite(df, out, partitionBy = Seq("bu"))
    assert(spark.read.parquet(out).count() === 3)
    // append adds
    Sinks.append(df.filter(col("id") === 1), out, partitionBy = Seq("bu"))
    assert(spark.read.parquet(out).count() === 4)
  }

  test("K3/K4: CSV and text write probes round-trip") {
    val csvOut = tmpDir("k3-out"); val txtOut = tmpDir("k4-out")
    Sinks.csv(Seq((1, "x"), (2, "y")).toDF("a", "b"), csvOut)
    val back = spark.read.option("header", "true").csv(csvOut)
    assert(back.count() === 2 && back.columns.toSeq === Seq("a", "b"))

    Sinks.text(Seq("test").toDF("value"), txtOut)
    assert(spark.read.text(txtOut).as[String].collect().toSeq === Seq("test"))
  }

  test("S8: catalog and column introspection answer without scanning") {
    Seq((1, "a")).toDF("id", "name").createOrReplaceTempView("s8_probe")
    assert(Checks.tableExists(spark, "s8_probe"))
    assert(!Checks.tableExists(spark, "s8_missing"))
    val df = Seq((1, "a")).toDF("id", "name")
    assert(Checks.missingColumns(df, Seq("id", "name")) === Nil)
    assert(Checks.missingColumns(df, Seq("id", "salary")) === Seq("salary"))
  }

  test("format round-trips: ORC and JSON-lines preserve schema and rows") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "name", "v")
    val orcOut = tmpDir("fmt-orc"); val jsonOut = tmpDir("fmt-json")

    df.write.mode("overwrite").orc(orcOut)
    val orcBack = spark.read.orc(orcOut)
    // compare names+types: file sources always read back nullable
    assert(orcBack.schema.map(f => (f.name, f.dataType)) ===
      df.schema.map(f => (f.name, f.dataType)))
    assert(orcBack.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)

    df.write.mode("overwrite").json(jsonOut)
    // JSON carries no types: read back with the explicit schema (the
    // same no-inference rule as the CSV source)
    val jsonBack = spark.read.schema(df.schema).json(jsonOut)
    assert(jsonBack.orderBy("id").collect().toSeq === df.orderBy("id").collect().toSeq)
  }
}
