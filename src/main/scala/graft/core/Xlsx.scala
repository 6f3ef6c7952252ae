package graft.core

import scala.collection.mutable

/** Minimal OOXML spreadsheet reader (SURVEY §2.1-S5) — an `.xlsx` file
  * is a zip archive of XML parts; the two that carry cell data are
  * `xl/worksheets/sheet1.xml` (cells) and `xl/sharedStrings.xml` (the
  * string pool `t="s"` cells index into). Both parse with JDK built-ins
  * (`java.util.zip` + StAX), so real Excel ingestion needs no external
  * reader — the reference loads its HR sheet with pandas
  * (commute_validation.py:187); this is the same data path without the
  * pre-convert-to-CSV manual step.
  *
  * Supported surface (what HR/config sheets actually use): shared
  * strings, inline strings, numbers/booleans as their raw `<v>` text,
  * sparse rows (missing cells become null via the `r="A1"` reference).
  * Formulas yield their cached `<v>` value; styles/dates are the
  * caller's cast concern (the explicit-schema contract in
  * [[Sources.xlsx]]).
  */
object Xlsx {

  /** "BC" of "BC12" → zero-based column 54. */
  private[core] def colIndex(cellRef: String): Int =
    cellRef.takeWhile(_.isLetter)
      .foldLeft(0)((acc, ch) => acc * 26 + (ch.toUpper - 'A' + 1)) - 1

  /** All rows of the first worksheet, as sparse string arrays sized to
    * the widest row seen (missing cells are null). */
  def rows(path: String): Seq[Array[String]] = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val shared = Option(zf.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zf.getInputStream(e)))
        .getOrElse(Vector.empty)
      val sheet = Option(zf.getEntry("xl/worksheets/sheet1.xml"))
        .getOrElse(throw new IllegalArgumentException(
          s"$path: no xl/worksheets/sheet1.xml — not an xlsx workbook"))
      val sparse = parseSheet(zf.getInputStream(sheet), shared)
      val width = sparse.iterator.map(r => if (r.isEmpty) 0 else r.keys.max + 1)
        .foldLeft(0)(math.max)
      sparse.map { cells =>
        Array.tabulate(width)(i => cells.getOrElse(i, null))
      }
    } finally zf.close()
  }

  private def reader(in: java.io.InputStream) = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    // hygiene: the zip came from outside — never resolve external entities
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  /** `<si>` entries in document order; rich-text runs (`<r><t>…`) are
    * concatenated like every spreadsheet app renders them. */
  private def parseSharedStrings(in: java.io.InputStream): Vector[String] = {
    val r = reader(in)
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => sb.clear()
            case "t"  => inT = true
            case _    =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if inT =>
          sb.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t"  => inT = false
            case "si" => out += sb.toString
            case _    =>
          }
        case _ =>
      }
    }
    r.close()
    out.result()
  }

  /** Sheet cells as (row order, colIndex → text). `t="s"` resolves
    * through the shared pool; `t="inlineStr"` reads its nested `<t>`;
    * anything else keeps the raw `<v>` text. */
  private def parseSheet(in: java.io.InputStream,
                         shared: Vector[String]): Seq[Map[Int, String]] = {
    val r = reader(in)
    val rowsOut = Seq.newBuilder[Map[Int, String]]
    var row: mutable.Map[Int, String] = null
    var cellCol = -1
    // the last cell's column within the current row: OOXML says a cell
    // without an r= reference sits one column after its predecessor.
    // Positioning by row.size instead would shift a later r-less cell
    // LEFT whenever an earlier cell had an empty value (empty cells are
    // never added to `row`) — silently mis-columned data (review r18).
    var lastCol = -1
    var cellType = ""
    val text = new StringBuilder
    var capture = false
    while (r.hasNext) {
      r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" => row = mutable.Map.empty; lastCol = -1
            case "c" =>
              cellCol = Option(r.getAttributeValue(null, "r")).map(colIndex)
                .getOrElse(if (row == null) -1 else lastCol + 1)
              if (row != null) lastCol = cellCol
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
              text.clear()
            case "v" | "t" => capture = true; // inline `<is><t>` and `<v>` both land in `text`
            case _ =>
          }
        case javax.xml.stream.XMLStreamConstants.CHARACTERS if capture =>
          text.append(r.getText)
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" | "t" => capture = false
            case "c" if row != null && cellCol >= 0 =>
              val v = cellType match {
                case "s" => shared(text.toString.trim.toInt)
                case _   => text.toString
              }
              if (v.nonEmpty) row.update(cellCol, v)
            case "row" => rowsOut += row.toMap; row = null
            case _ =>
          }
        case _ =>
      }
    }
    r.close()
    rowsOut.result()
  }
}
