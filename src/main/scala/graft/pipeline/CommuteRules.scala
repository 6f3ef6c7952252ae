package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.Schemas.Domains

/** Commute-validation enrichment (reference
  * `commute_validation/commute_validation.py:84-120`), as pure Column
  * logic over a distance table.
  *
  * The reference loops employees in Python calling the Google Distance
  * Matrix API per row (0.2 s sleep — 161 sequential calls). Nondeterm-
  * inistic external I/O never belongs inside a Catalyst expression
  * (SURVEY §7.3): a [[DistanceProvider]] materializes `(id_employee,
  * distance_m, duration_s)` up front (batch API job, cache table, or the
  * deterministic stub in tests), and validation is a codegen'd
  * projection joined against it — at 100 TB-scale employee tables this
  * is a broadcast join + map, not an RPC per row.
  *
  * Exact reference semantics preserved:
  *   - non-sporty mode → invalid, no distance call,
  *     `"Mode de transport '<m>' non sportif"` (:90);
  *   - provider returned no distance → invalid,
  *     `"Impossible de calculer la distance"` (:104);
  *   - distance ≤ limit → valid, NULL error;
  *   - else `"Distance (X.X km) > limite (Y.Y km)"` with Python's
  *     `f"{d/1000:.1f}"` / `str(max/1000)` rendering (15000 → "15.0").
  */
object CommuteRules {

  /** Distance source: must yield one row per employee id it can resolve,
    * columns (id_employee, distance_m: int, duration_s: int). */
  trait DistanceProvider {
    def distances(employees: DataFrame): DataFrame
  }

  /** Deterministic stub: distance = stable hash of address in [0, 30000);
    * duration = distance/250 (≈15 km/h). Mirrors FIXTURES.md §2. */
  object StubProvider extends DistanceProvider {
    override def distances(employees: DataFrame): DataFrame =
      employees.select(
        col("id_employee"),
        pmod(xxhash64(col("address")), lit(30000L)).cast(IntegerType).as("distance_m"))
        .withColumn("duration_s", (col("distance_m") / 250).cast(IntegerType))
  }

  private def limitFor(mode: Column): Column =
    Domains.commuteLimits.foldLeft(lit(null).cast(IntegerType)) {
      case (acc, (m, lim)) => when(mode === m, lit(lim)).otherwise(acc)
    }

  /** Validate commutes: employees ⋈ distances (left — provider may fail
    * rows) → commute_validations rows. `createdAt` injectable for
    * deterministic tests (reference default CURRENT_TIMESTAMP,
    * init-db.sql:33). */
  def validate(employees: DataFrame, provider: DistanceProvider,
               createdAt: Column = current_timestamp()): DataFrame = {
    val dist = provider.distances(employees)
      .select(col("id_employee"), col("distance_m"), col("duration_s"))
    val joined = employees
      .select("id_employee", "transport_mode")
      .join(dist, Seq("id_employee"), "left")

    val limit   = limitFor(col("transport_mode"))
    val sporty  = limit.isNotNull
    val hasDist = col("distance_m").isNotNull
    val valid   = sporty && hasDist && col("distance_m") <= limit

    val error = when(!sporty,
        format_string("Mode de transport '%s' non sportif", col("transport_mode")))
      .when(!hasDist, lit("Impossible de calculer la distance"))
      .when(col("distance_m") > limit,
        // rint(x·10)/10 rounds HALF-EVEN on the binary value like
        // Python's f"{d/1000:.1f}" (17250 → "17.2"); Java's bare %.1f
        // would round HALF-UP ("17.3") and break reference parity on
        // .25-exact kilometre ties
        format_string("Distance (%.1f km) > limite (%.1f km)",
          rint(col("distance_m").cast(DoubleType) / 1000 * 10) / 10,
          limit.cast(DoubleType) / 1000))
      .otherwise(lit(null).cast(StringType))

    // non-sporty rows never call the provider in the reference → NULLs
    val keepDist = sporty && hasDist

    joined
      // serial-PK parity (SERIAL id_validate) inherently needs a total
      // order; the single-partition window is bounded by |employees| —
      // a dimension table — never by fact volume
      .withColumn("id_validate",
        row_number().over(Window.orderBy("id_employee")))
      .select(
        col("id_validate"),
        col("id_employee"),
        when(keepDist, col("distance_m")).cast(DecimalType(10, 2)).as("calculed_distance"),
        when(keepDist, col("duration_s")).cast(DecimalType(10, 2)).as("calculed_duration"),
        valid.as("is_valid"),
        error.as("error_message"),
        createdAt.as("created_at"))
  }
}
