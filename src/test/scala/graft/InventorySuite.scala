package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Inventory

/** Inventory structural invariants + the README count-drift guard: prose
  * numbers about the query inventory rotted across two releases before
  * this test existed (77/75 → 78/76 → 80/78), so the README's claim is
  * now parsed and compared mechanically — it CANNOT drift silently. */
class InventorySuite extends AnyFunSuite {

  test("query names are unique and every oracle aliases its columns (byName invariant)") {
    assert(Inventory.byName.size === Inventory.all.size)
    assert(Inventory.all.forall(_.name.nonEmpty))
  }

  test("README query counts match Inventory exactly (drift guard)") {
    val readme = scala.io.Source.fromFile("README.md", "UTF-8")
    val text = try readme.mkString finally readme.close()
    val claim = raw"(\d+) declared queries \((\d+) oracle-checked\)".r
    val m = claim.findFirstMatchIn(text).getOrElse(
      fail("README.md no longer states 'N declared queries (M oracle-checked)' — " +
        "update this guard if the phrasing changed"))
    val declared = m.group(1).toInt
    val oracled = m.group(2).toInt
    assert(declared === Inventory.all.size,
      s"README claims $declared declared queries; Inventory has ${Inventory.all.size}")
    assert(oracled === Inventory.all.count(_.oracle.isDefined),
      s"README claims $oracled oracle-checked; Inventory has " +
        s"${Inventory.all.count(_.oracle.isDefined)}")
  }

  test("no other numeric inventory claims linger in README (only the guarded phrase counts queries)") {
    val readme = scala.io.Source.fromFile("README.md", "UTF-8")
    val text = try readme.mkString finally readme.close()
    // the two historical drift sites: a ScalaTest case count and an
    // 'N/N DuckDB hash-equality' tally — both are now non-numeric
    assert(!raw"\d+ ScalaTest cases".r.findFirstIn(text).isDefined,
      "README hardcodes a ScalaTest case count again — it WILL drift")
    assert(!raw"\d+/\d+ DuckDB".r.findFirstIn(text).isDefined,
      "README hardcodes a gate tally again — it WILL drift")
  }

  test("SURVEY carries no case/suite tallies and its live query count matches Inventory") {
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val text = try survey.mkString finally survey.close()
    // round 7's '28 suites' drift class: prose counts of test cases or
    // suites rot with every added spec — they must not appear at all
    assert(!raw"\d+ ScalaTest cases".r.findFirstIn(text).isDefined,
      "SURVEY hardcodes a ScalaTest case count — it WILL drift")
    assert(!raw"across \d+ suites".r.findFirstIn(text).isDefined,
      "SURVEY hardcodes a suite count — it WILL drift")
    // the CURRENT round-state paragraph must agree with Inventory (older
    // rounds' paragraphs are history and keep their frozen numbers).
    // "Current" = the HIGHEST round number present — the guard itself
    // hardcoded "Round-16" in r16 and silently rotted one round later
    // (r17 full-suite run), which is exactly the drift class it exists
    // to kill; claim_check.py's max-round parse is the precedent.
    val ms = raw"Round-(\d+) state: (\d+) declared queries — (\d+) oracle-checked".r
      .findAllMatchIn(text).toSeq
    assert(ms.nonEmpty,
      "SURVEY round-state phrasing changed — update this guard")
    val m = ms.maxBy(_.group(1).toInt)
    assert(m.group(2).toInt === Inventory.all.size,
      s"SURVEY round-${m.group(1)} claims ${m.group(2)} declared; " +
        s"Inventory has ${Inventory.all.size}")
    assert(m.group(3).toInt === Inventory.all.count(_.oracle.isDefined),
      s"SURVEY round-${m.group(1)} claims ${m.group(3)} oracle-checked; " +
        s"Inventory has ${Inventory.all.count(_.oracle.isDefined)}")
  }
}
