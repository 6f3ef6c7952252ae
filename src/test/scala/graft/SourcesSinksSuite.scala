package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{Sinks, Sources}
import graft.quality.Checks

/** Source/sink constructors (SURVEY §2.1–§2.2) that are testable without
  * external services: CSV-with-schema and real xlsx (S5), rate fallback
  * (S2), batch overwrite/append incl. partitioned form (K2), CSV/text
  * probes (K3/K4), catalog introspection (S8), and JDBC scan/pushdown/
  * append (S4/K5) against the embedded Derby engine Spark already
  * ships for its Hive metastore — a real JDBC server path, in-process. */
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

  test("S5: real xlsx workbook reads through the explicit schema") {
    val dir = tmpDir("xlsx-src")
    val path = java.nio.file.Paths.get(dir, "hr.xlsx").toString
    writeTestXlsx(path)
    val df = Sources.xlsx(spark, path, hrSchema)
    assert(df.schema.map(f => (f.name, f.dataType)) ===
      hrSchema.map(f => (f.name, f.dataType)))
    val rows = df.orderBy("id_employee").collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1, 2, 3))
    // shared string, sparse cell (missing B3 → null), inline string with
    // XML entities — the three cell shapes HR sheets contain
    assert(rows.map(_.getString(1)).toSeq === Seq("Ada", null, "Grâce & Co"))
    assert(rows.map(_.getInt(2)).toSeq === Seq(52000, 61000, 48000))
  }

  test("S4/K5: JDBC scan, pushdown, and append against embedded Derby") {
    val url = "jdbc:derby:memory:graftdb;create=true"
    val props = new java.util.Properties()
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE employees_masked (" +
        "id_employee INT, first_name VARCHAR(40), gross_salary INT)")
      st.execute("INSERT INTO employees_masked VALUES " +
        "(1,'Ada',52000),(2,'Grace',61000),(3,'Edsger',48000)")
      st.close()
    } finally conn.close()

    // S4: whole-table scan
    val df = Sources.jdbc(spark, url, "employees_masked", props)
    assert(df.count() === 3)
    assert(df.schema.fieldNames.map(_.toLowerCase).toSeq ===
      Seq("id_employee", "first_name", "gross_salary"))

    // S4 at scale: projection + predicate execute inside the database —
    // the frame never carries the pruned column
    val pushed = Sources.jdbcPushdown(spark, url,
      "SELECT id_employee, gross_salary FROM employees_masked WHERE gross_salary >= 50000",
      props)
    assert(pushed.schema.fieldNames.length === 2)
    assert(pushed.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))

    // K5: executor-side batched append; Spark creates the table through
    // its Derby dialect
    Sinks.jdbcAppend(df.filter(col("gross_salary") > 50000), url, "high_earners", props)
    assert(Sources.jdbc(spark, url, "high_earners", props).count() === 2)
    Sinks.jdbcAppend(df.filter(col("gross_salary") <= 50000), url, "high_earners", props)
    assert(Sources.jdbc(spark, url, "high_earners", props).count() === 3)
  }

  /** A structurally complete workbook (content types, rels, workbook,
    * shared strings, sheet) — what Excel itself would zip up, built with
    * the same JDK zip the reader uses. */
  private def writeTestXlsx(path: String): Unit = {
    import java.util.zip.{ZipEntry, ZipOutputStream}
    val zos = new ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>""")
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="HR" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4"><si><t>id_employee</t></si><si><t>first_name</t></si><si><t>gross_salary</t></si><si><t>Ada</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="s"><v>2</v></c></row><row r="2"><c r="A2"><v>1</v></c><c r="B2" t="s"><v>3</v></c><c r="C2"><v>52000</v></c></row><row r="3"><c r="A3"><v>2</v></c><c r="C3"><v>61000</v></c></row><row r="4"><c r="A4"><v>3</v></c><c r="B4" t="inlineStr"><is><t>Gr&#226;ce &amp; Co</t></is></c><c r="C4"><v>48000</v></c></row></sheetData></worksheet>""")
    zos.close()
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

  test("schema evolution: mergeSchema unions old and new columns, old rows read null") {
    val out = tmpDir("evolve")
    // batch 1 writes the v1 schema; batch 2 appends with an added column
    Seq((1L, "a")).toDF("id", "name").write.mode("append").parquet(out)
    Seq((2L, "b", 9.5)).toDF("id", "name", "score").write.mode("append").parquet(out)

    // default read picks ONE file's schema (footer sampling) — the
    // evolving-lake read must opt into the merged view
    val merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert(merged.schema.fieldNames.sorted.toSeq === Seq("id", "name", "score"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).getAs[Any]("score") === null) // pre-evolution row
    assert(rows(1).getAs[Double]("score") === 9.5)
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

  test("manifest write + verify: clean copy all-ok; a tampered shard is named") {
    import graft.core.{Sinks, Tables}
    val dir = tmpDir("manifest-out")
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "lang", "n_chars")
    Sinks.writeWithManifest(docs, dir, shards = 4, sortCol = "doc_id")
    // manifest totals cover every row
    val v1 = Sinks.verifyManifest(spark, dir).collect()
    assert(v1.nonEmpty && v1.forall(_.getAs[Boolean]("ok")), v1.mkString("\n"))
    // corrupt ONE shard (rewrite it with a row dropped) — only that
    // shard may flag, and by name
    val aShard = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).minBy(_.getName)
    val tampered = spark.read.parquet(aShard.getPath).limit(1)
    val tmp = tmpDir("manifest-tamper")
    tampered.coalesce(1).write.mode("overwrite").parquet(tmp)
    val newFile = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(newFile.toPath, aShard.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the local FS's stale .crc sidecar — object stores (the 100 TB
    // home of a published dataset) have no such sidecar; the manifest is
    // what catches the corruption there
    val crc = new java.io.File(aShard.getParent, s".${aShard.getName}.crc")
    if (crc.exists()) assert(crc.delete())
    val v2 = Sinks.verifyManifest(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getBoolean(1), r.getString(2))).toMap
    assert(!v2(aShard.getName)._1 && v2(aShard.getName)._2 == "row count")
    assert(v2.filterNot(_._1 == aShard.getName).values.forall(_._1),
      s"untampered shards must stay ok: $v2")
  }
}
