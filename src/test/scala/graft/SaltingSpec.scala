package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Salting

/** Skew-salting operators: the salt must change the partitioning, never
  * the result. Also bounds the approx_count_distinct error (a9). */
class SaltingSpec extends SparkSuite {

  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("salted two-phase aggregate equals the plain groupBy") {
    val ev = Tables(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        col("value").cast("decimal(18,4)").as("v"))
    val salted = Salting.saltedSumCount(ev, Seq("event_type"), "v", 8, col("event_id"))
      .select("event_type", "cnt", "sum_v")
    val plain = ev.groupBy("event_type")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"))
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted join equals the plain inner join") {
    val big = Tables(spark, sfDir, "orders")
      .select(col("o_custkey").as("custkey"), col("o_orderkey"), col("o_totalprice"))
    val dim = Tables(spark, sfDir, "customer")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment"))
    val salted = Salting.saltedJoin(big, dim, "custkey", 4, col("o_orderkey"))
      .select("custkey", "o_orderkey", "c_mktsegment")
    val plain = big.join(dim, Seq("custkey"))
      .select("custkey", "o_orderkey", "c_mktsegment")
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted join spreads a manufactured hot key across salts") {
    val hot = (1 to 1000).map(i => (42L, i.toLong)).toDF("custkey", "rowid")
    val dim = Seq((42L, "HOT")).toDF("custkey", "seg")
    val joined = Salting.saltedJoin(hot, dim, "custkey", 8, col("rowid"))
    assert(joined.count() === 1000)
    // the salt really fans the hot key out (not all rows in one bucket)
    val salts = hot.withColumn("s", pmod(xxhash64(col("rowid")), lit(8L)))
      .select("s").distinct().count()
    assert(salts > 4)
  }

  test("approx_count_distinct stays within the declared 2% of exact (a9)") {
    val o = Tables(spark, sfDir, "orders")
    val approx = o.groupBy("o_orderstatus")
      .agg(approx_count_distinct(col("o_custkey"), 0.02).as("a"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = o.groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.05,
        s"group $k: approx $a vs exact $e drifts > 5%")
    }
  }

  test("Exact.bigColToDouble: round-trips sign, 2^52 boundaries, and agrees with BigDecimal rounding") {
    import org.apache.spark.sql.types.DecimalType
    import graft.queries.Exact
    val cases = Seq(
      BigDecimal(0), BigDecimal(1), BigDecimal(-1),
      BigDecimal(Exact.Split), BigDecimal(Exact.Split) - 1,
      BigDecimal(Exact.Split) + 1, BigDecimal(-Exact.Split),
      BigDecimal("9007199254740993"),            // 2^53+1: first non-exact int
      BigDecimal("123456789012345678901234567"), // >2^53, both signs
      BigDecimal("-123456789012345678901234567"),
      BigDecimal("34256215043677696123"))        // t14-magnitude value
    // explicit DECIMAL(38,0) schema: the default product encoder is
    // DECIMAL(38,18), whose integral range the big cases overflow
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v", DecimalType(38, 0))))
    val rows = cases.map(v =>
      org.apache.spark.sql.Row(new java.math.BigDecimal(v.bigDecimal.toBigInteger)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
      .withColumn("d", Exact.bigColToDouble("v"))
    df.collect().foreach { r =>
      val v = BigDecimal(r.getDecimal(0))
      val expect = v.bigDecimal.doubleValue // correctly-rounded reference
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ===
        java.lang.Double.doubleToLongBits(expect),
        s"$v: got ${r.getDouble(1)}, want $expect")
    }
  }

  test("HLL union of daily sketches equals the sketch of the union exactly (a24)") {
    // merge is lossless at fixed lgK: estimating after a union-merge of
    // per-day sketches must give the IDENTICAL estimate to sketching
    // the whole column in one pass — this is what licenses persisting
    // daily sketches and never re-reading raw data for rollups
    val ev = Tables(spark, sfDir, "events").filter(col("user_id").isNotNull)
    val merged = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy("event_type")
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = ev.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
  }

  test("exact integer-moment correlation agrees with Spark's corr() to float tolerance (a22)") {
    // a22's DECIMAL(38,0) moments must reproduce the statistic itself;
    // the gate proves cross-engine hash equality, this proves the math.
    val got = graft.queries.Inventory.byName("a22_corr_exact")
      .run(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val ref = Tables(spark, sfDir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"),
        floor(col("l_extendedprice") * lit(1e2)).cast("long").as("y"))
      .groupBy("l_returnflag")
      .agg(corr(col("x"), col("y")).as("c"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    ref.foreach { case (k, c) =>
      assert(math.abs(got(k) - c) < 1e-9, s"group $k: exact ${got(k)} vs corr $c")
    }
  }

  test("w7 rolling slope equals the covar_pop/var_pop OLS slope (independent pin)") {
    // the gate proves both engines emit the same number; this proves the
    // number IS the OLS slope. Slope is shift-invariant in x, so the
    // trailing-8 frame's slope is covar_pop(rn, v)/var_pop(rn) with rn
    // as the x coordinate — Spark's own estimators, none of w7's
    // integer-weight algebra. Caught-by-construction: the r9 divisor
    // bug (42 instead of 2·Sxx = 84) made every emitted value exactly
    // 2× this reference and would fail here.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("event_id")
    val frame = w.rowsBetween(-7, 0)
    val ev = Tables(spark, sfDir, "events")
      .filter(col("value").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        floor(col("value") * lit(1e6)).cast("long").as("v"))
    // covar_pop needs the x column materialized before the frame pass
    val withX = ev.withColumn("rn2", row_number().over(w).cast("double"))
      .withColumn("s",
        covar_pop(col("rn2"), col("v").cast("double")).over(frame) /
          var_pop(col("rn2")).over(frame))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") >= 8)
      .select(col("user_id"), col("event_id"), (col("s") / lit(1e6)).as("slope"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = graft.queries.Inventory.byName("w7_rolling_slope")
      .run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.size === withX.size && got.nonEmpty)
    withX.foreach { case (k, s) =>
      assert(math.abs(got(k) - s) < 1e-9 + 1e-9 * math.abs(s),
        s"key $k: w7 ${got(k)} vs covar_pop slope $s")
    }
  }

  test("t18 group trend equals the covar_pop/var_pop OLS fit (independent pin)") {
    // same discipline as the w7 pin: the gate proves engine agreement,
    // this proves the agreed number IS the OLS line. x here is seconds
    // since the group's first event and y the raw value — Spark's own
    // covariance estimators, none of t18's integer-moment algebra.
    // The y micro-flooring (1e-4 quantum) perturbs slope and intercept
    // below 1e-6 relative on this data; tolerance reflects that.
    import org.apache.spark.sql.expressions.Window
    val ev = Tables(spark, sfDir, "events")
      .filter(col("value").isNotNull)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .withColumn("mn", min(col("us")).over(Window.partitionBy("event_type")))
      .select(col("event_type"),
        expr("CAST((us - mn) DIV 1000000 AS DOUBLE)").as("x"),
        col("value").cast("double").as("y"))
    // null-safe readout: a degenerate group (n=1 or zero x-variance)
    // yields NULL slope/intercept on BOTH sides — compare as Options
    def opt(r: org.apache.spark.sql.Row, i: Int): Option[Double] =
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    val ref = ev.groupBy("event_type")
      .agg((covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("slope"),
        (avg(col("y")) - covar_pop(col("x"), col("y")) / var_pop(col("x")) *
          avg(col("x"))).as("intercept"))
      .collect().map(r => r.getString(0) -> (opt(r, 1), opt(r, 2))).toMap
    val got = graft.queries.Inventory.byName("t18_group_trend")
      .run(spark, sfDir)
      .collect().map(r => r.getString(0) -> (opt(r, 2), opt(r, 3))).toMap
    assert(got.size === ref.size && got.nonEmpty)
    def close(a: Double, b: Double) = math.abs(a - b) < 1e-9 + 1e-4 * math.abs(b)
    ref.foreach { case (k, (s, i)) =>
      (got(k), s, i) match {
        case ((Some(gs), Some(gi)), Some(rs), Some(ri)) =>
          assert(close(gs, rs), s"$k: t18 slope $gs vs covar_pop $rs")
          assert(close(gi, ri), s"$k: t18 intercept $gi vs OLS $ri")
        case ((gs, gi), rs, ri) =>
          assert(gs.isEmpty === rs.isEmpty && gi.isEmpty === ri.isEmpty,
            s"$k: degenerate-group nullness disagrees: t18 ($gs, $gi) vs ref ($rs, $ri)")
      }
    }
  }

  test("embedCovariance equals covar_pop cell-by-cell (independent pin)") {
    // the micro-point flooring quantizes each value at 1e-6, so cells
    // (magnitude ~1/64 on unit vectors) agree to ~1e-5 absolute
    val emb = Tables(spark, sfDir, "embeddings")
    val flat = emb.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("pos", "x")))
    val ref = flat.select(col("vec_id"), col("pos").as("i"),
        col("x").cast("double").as("xi"))
      .join(flat.select(col("vec_id"), col("pos").as("j"),
        col("x").cast("double").as("xj")), "vec_id")
      .groupBy("i", "j").agg(covar_pop(col("xi"), col("xj")).as("c"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val got = graft.operators.Similarity.embedCovariance(emb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(3)).toMap
    assert(got.size === ref.size && got.size === 64 * 64)
    ref.foreach { case (k, c) =>
      assert(math.abs(got(k) - c) < 1e-5, s"cell $k: exact ${got(k)} vs covar_pop $c")
    }
  }

  test("approx_percentile stays within the GK rank-error bound of exact (a21)") {
    // GK sketch contract: a returned value's RANK is within n/accuracy
    // of the target rank q·n. Assert in rank space (value-space deltas
    // depend on the local density and bound nothing).
    val accuracy = 1000L
    val ev = Tables(spark, sfDir, "events").filter(col("value").isNotNull)
    val qs = Seq(0.5, 0.95, 0.99)
    val approx = ev.groupBy("event_type")
      .agg(expr(s"approx_percentile(value, array(${qs.mkString(",")}), $accuracy)")
        .as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val n = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    approx.foreach { case (k, ps) =>
      qs.zip(ps).foreach { case (q, v) =>
        val rank = ev.filter(col("event_type") === k && col("value") <= v).count()
        val target = q * n(k)
        val tol = n(k).toDouble / accuracy + 1
        assert(math.abs(rank - target) <= tol,
          s"group $k q=$q: rank $rank vs target $target exceeds ±$tol")
      }
    }
  }
}
