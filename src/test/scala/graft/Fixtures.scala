package graft

import java.sql.{Date, Timestamp}

import scala.util.Random

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.core.Schemas

/** Deterministic reference-domain fixtures (FIXTURES.md §§1-4, §9):
  * a 20-employee sample covering every transport mode / BU / contract
  * type, a seeded activity generator (shape of
  * activity_generator/sport_generation.py), and a Debezium-envelope JSON
  * emitter for streaming tests. Seed fixed → byte-stable outputs.
  */
object Fixtures {

  import Schemas.Domains._

  /** 20 employees: ids 1..20. Employee 1 walks (valid-commute candidate),
    * 2 bikes, 3 public transport (non-sporty), 4 drives (non-sporty);
    * the rest rotate. Employee 1 gets zero activities. */
  def employees(spark: SparkSession): DataFrame = {
    val rows = (1 to 20).map { i =>
      Row(
        i,
        s"First$i",
        s"Last$i",
        Date.valueOf(f"19${70 + i % 25}%02d-01-${1 + i % 28}%02d"),
        businessUnits(i % businessUnits.size),
        Date.valueOf(f"20${10 + i % 14}%02d-06-${1 + i % 28}%02d"),
        30000 + i * 1000,
        contractTypes(i % contractTypes.size),
        s"$i rue des Tests, Montpellier",
        transportModes((i - 1) % transportModes.size),
        20 + i % 10)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.employees)
  }

  /** Seeded activities: employee i gets i-1 activities (so employee 16+
    * exceeds the 15-activity bonus threshold, employee 1 has none via
    * id=20 zero rule: employee 20 → 19 rows, employee 1 → 0 rows). */
  def activities(spark: SparkSession, seed: Long = 42L): DataFrame = {
    val rng = new Random(seed)
    var id = 0
    val rows = (1 to 20).flatMap { emp =>
      (1 until emp).map { _ =>
        id += 1
        val sport = sportTypes(rng.nextInt(sportTypes.size))
        val hasDistance = rng.nextBoolean()
        Row(
          id, emp, s"First$emp", s"Last$emp",
          Timestamp.valueOf(f"2024-${1 + rng.nextInt(12)}%02d-${1 + rng.nextInt(28)}%02d " +
            f"${6 + rng.nextInt(16)}%02d:${rng.nextInt(60)}%02d:00"),
          sport,
          if (hasDistance) Integer.valueOf(500 + rng.nextInt(20000)) else null,
          1800 + rng.nextInt(5400),
          if (rng.nextInt(100) < 29) s"Commentaire $id" else null)
      }
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), Schemas.sportActivitiesPg)
  }

  /** Debezium envelope JSON line for one activity row (FIXTURES §4):
    * start_datetime as epoch MICROseconds. */
  def envelopeJson(id: Int, idEmployee: Int, firstName: String,
                   lastName: String, epochMicros: Long, sportType: String,
                   distance: Option[Int], duration: Int,
                   comment: Option[String], tsMs: Long = 0L): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val dist = distance.map(_.toString).getOrElse("null")
    val comm = comment.map(q).getOrElse("null")
    s"""{"payload": {"after": {"id": $id, "id_employee": $idEmployee, """ +
      s""""first_name": ${q(firstName)}, "last_name": ${q(lastName)}, """ +
      s""""start_datetime": $epochMicros, "sport_type": ${q(sportType)}, """ +
      s""""distance": $dist, "activity_duration": $duration, "comment": $comm}, """ +
      s""""op": "c", "ts_ms": $tsMs}}"""
  }

  /** Debezium DELETE envelope: `op: "d"`, row image in `payload.before`,
    * `payload.after` null — the shape SaveDelta.scala:140-147 silently
    * drops. */
  def envelopeDeleteJson(id: Int, idEmployee: Int, epochMicros: Long,
                         sportType: String, tsMs: Long = 0L): String =
    s"""{"payload": {"before": {"id": $id, "id_employee": $idEmployee, """ +
      s""""start_datetime": $epochMicros, "sport_type": "$sportType", """ +
      s""""distance": null, "activity_duration": 100, "comment": null}, """ +
      s""""after": null, "op": "d", "ts_ms": $tsMs}}"""

  /** Minimal structurally-complete xlsx workbook (zip of OOXML parts),
    * every cell an inline string — the generic builder for S5 source
    * tests; null cells are omitted (sparse rows). */
  def writeXlsx(path: String, rows: Seq[Seq[String]]): Unit = {
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    def esc(s: String) =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val sheetRows = rows.zipWithIndex.map { case (cells, r) =>
      cells.zipWithIndex.collect { case (v, c) if v != null =>
        s"""<c r="${colRef(c)}${r + 1}" t="inlineStr"><is><t>${esc(v)}</t></is></c>"""
      }.mkString(s"""<row r="${r + 1}">""", "", "</row>")
    }.mkString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8")); zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    put("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>""")
    zos.close()
  }

  /** A small CDC stream file: 5 good events (2 with comments), 1
    * tombstone-ish null-id event, 1 malformed line. */
  def writeCdcFixture(dir: String): Unit = {
    val lines = Seq(
      envelopeJson(1, 1, "First1", "Last1", 1713439245000000L, "Course à pied",
        Some(8000), 3100, Some("Super séance aujourd'hui !")),
      envelopeJson(2, 2, "First2", "Last2", 1713442800000000L, "Yoga",
        None, 3600, None),
      envelopeJson(3, 3, "First3", "Last3", 1713446400000000L, "Vélo",
        Some(25000), 4500, Some("Belle sortie")),
      envelopeJson(4, 4, "First4", "Last4", 1713450000000000L, "Natation",
        Some(1500), 2400, None),
      envelopeJson(5, 5, "First5", "Last5", 1713453600000000L, "Marche",
        Some(4000), 3000, None),
      """{"payload": {"after": {"id": null, "sport_type": "Judo"}, "op": "c"}}""",
      """not-json-at-all""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "events.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
  }
}
