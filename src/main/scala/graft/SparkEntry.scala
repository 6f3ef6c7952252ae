package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Inventory

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The actual inventory lives in [[graft.queries.Inventory]]: one entry
  * per operator of SURVEY.md §2 (+ the LLM-pipeline extensions), each with
  * a DuckDB-equivalent oracle where SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Uses the canonical commute-prime-shaped CTE query (SURVEY E3). */
  def entry(spark: SparkSession): DataFrame =
    Inventory.byName("j3_cte_prime").run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Inventory.all.map(e => e.name -> e.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Inventory.all.flatMap(e => e.oracle.map(sql => e.name -> sql.stripMargin)).toMap
}
