package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.operators.{Quantizer, SemanticDedup}

/** SemDeDup semantics: map-side cell assignment, intra-cell prune,
  * keep-the-earliest survivor policy — including the production path with
  * KMeans-trained centroids. */
class SemanticDedupSpec extends SparkSuite {
  import spark.implicits._

  // two tight groups near the x and y axes plus one outlier; within-group
  // cosines ≈ 1, across-group ≈ 0.
  private lazy val vectors = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.01f, 0.0f)),
    (2L, Array(0.98f, 0.02f, 0.0f)),
    (10L, Array(0.0f, 1.0f, 0.0f)),
    (11L, Array(0.01f, 0.99f, 0.0f)),
    (20L, Array(0.5f, 0.5f, 0.7f))
  ).toDF("vec_id", "embedding")

  private val axes: Array[Array[Float]] =
    Array(Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f))

  test("assignCells is a map-side argmax toward the nearest centroid") {
    val assigned = SemanticDedup.assignCells(vectors, axes)
    val cells = assigned.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    assert(cells(0L) === 0L && cells(1L) === 0L && cells(2L) === 0L)
    assert(cells(10L) === 1L && cells(11L) === 1L)
    // no join, no shuffle: the plan is scan + project only
    val plan = assigned.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Join") && !plan.contains("Exchange"))
  }

  test("incrementalSurvivors ≡ full recompute, including a batch arrival evicting a base survivor") {
    // interleaved split: batch holds id 1 (SMALLER than base's 2) — the
    // fold must evict base survivor 2 exactly as a recompute would
    def surv(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = surv(SemanticDedup.survivors(
      SemanticDedup.assignCells(vectors, axes), 0.9))
    val splits = Seq(
      Set(0L, 2L, 10L, 20L),        // batch {1, 11}: 1 < 2 evicts 2
      Set(1L, 2L, 11L, 20L),        // batch {0, 10}: 0 evicts 1 and 2
      Set(0L, 1L, 2L, 10L, 11L),    // batch = outlier only
      Set[Long]())                  // empty base
    splits.foreach { baseIds =>
      val base = vectors.filter(col("vec_id").isInCollection(baseIds))
      val batch = vectors.filter(!col("vec_id").isInCollection(baseIds))
      val ba = SemanticDedup.assignCells(base, axes)
      val inc = surv(SemanticDedup.incrementalSurvivors(
        ba, SemanticDedup.survivors(ba, 0.9), batch, axes, 0.9))
      assert(inc === full, s"base=$baseIds: $inc vs $full")
    }
  }

  test("tie between cells breaks toward the lowest cell id") {
    val tied = Seq((7L, Array(1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cell = SemanticDedup.assignCells(tied, axes).head().getAs[Long]("cell")
    assert(cell === 0L)
  }

  test("survivors keep the lowest id per near-dup group, outliers untouched") {
    val assigned = SemanticDedup.assignCells(vectors, axes)
    val kept = SemanticDedup.survivors(assigned, 0.95)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // 1,2 pruned by 0; 11 pruned by 10; the off-axis 20 survives in its cell
    assert(kept === Set(0L, 10L, 20L))
  }

  test("intra-cell pairs never cross cells even when cosine is high") {
    // two near-identical vectors forced into different cells would be
    // invisible to the prune — the declared recall trade of clustering.
    val assigned = SemanticDedup.assignCells(vectors, axes)
    val cellOf = assigned.collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val pairs = SemanticDedup.intraCellPairs(assigned, 0.0)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(pairs.forall { case (a, b) => cellOf(a) == cellOf(b) })
    // 0 ⊥ 10 sit in different cells: even at threshold 0 the pair is
    // invisible — the declared recall trade of clustering
    assert(!pairs.contains((0L, 10L)))
    // ...while same-cell pairs at any cosine ≥ 0 do appear
    assert(pairs.contains((0L, 1L)))
  }

  test("production path: KMeans codebook from Quantizer drives the same prune") {
    val emb = vectors.withColumn("label", lit(0))
    val (_, codebook) = Quantizer.trainAndAssign(emb, k = 2, seed = 7L)
    val kept = SemanticDedup
      .survivors(SemanticDedup.assignCells(emb, codebook), 0.95)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    // KMeans centroids sit inside each group → same survivor set
    assert(kept === Set(0L, 10L, 20L))
  }

  test("the prune join is an equi-join on cell, never a product") {
    val plan = SemanticDedup
      .survivors(SemanticDedup.assignCells(vectors, axes), 0.4)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }
}
