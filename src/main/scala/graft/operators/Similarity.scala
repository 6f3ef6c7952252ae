package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.{vecDot, vecNorm2}

/** Similarity search over an `(vec_id: long, embedding: array<float>,
  * label: int)` table.
  *
  * Scale design:
  *   - per-vector norms are computed ONCE in a projection before any
  *     pairing (O(n·d) instead of O(n²·d) — at 2M-pair scale this is the
  *     difference between 1 and 3 dot products per pair), and
  *     `sqrt(norm²)` is the same expression the DuckDB oracle uses, so
  *     results stay bit-identical;
  *   - the query set is broadcast (it is small by construction); the data
  *     side streams through a map-side cosine — no shuffle of embeddings;
  *   - top-k per query is a rank over (query, cosine): the window here
  *     ranks |queries|·n rows already reduced by the broadcast join;
  *   - the IVF variant prunes by cell (`label`, a cluster id from a
  *     pre-trained quantizer): probing one cell turns a full scan into a
  *     1/cells scan — the same pruning a label-partitioned table gives
  *     for free at 100 TB.
  */
object Similarity {

  /** Attach the L2 norm once: (cols…, nrm). */
  private def withNorm(df: DataFrame, embCol: String, as: String): DataFrame =
    df.withColumn(as, sqrt(vecNorm2(col(embCol))))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * other vectors by cosine similarity (self excluded). */
  def knnBrute(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(withNorm(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")),
      "q_emb", "q_nrm"))
    val d = withNorm(emb, "embedding", "nrm")
    val scored = d.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (vecDot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF-style pruned top-k: only score vectors in the query's own cell
    * (`label`). One-probe IVF: recall trades against the 1/cells scan. */
  def knnIvf(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(withNorm(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label")),
      "q_emb", "q_nrm"))
    val d = withNorm(emb, "embedding", "nrm")
    val scored = d.join(q, col("label") === col("q_label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (vecDot(col("q_emb"), col("embedding")) / (col("q_nrm") * col("nrm")))
          .as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Embedding near-duplicate pairs: all (a < b) with cosine ≥ threshold.
    * Brute force at test scale; the LSH/IVF-blocked variant replaces the
    * self-join condition with a bucket equality at 100 TB. */
  def cosinePairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = withNorm(
      emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a")),
      "e_a", "nrm_a")
    val b = withNorm(
      emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b")),
      "e_b", "nrm_b")
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        (vecDot(col("e_a"), col("e_b")) / (col("nrm_a") * col("nrm_b")))
          .as("cos"))
      .filter(col("cos") >= threshold)
  }
}
