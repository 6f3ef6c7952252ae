package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine

/** Similarity search over an `(vec_id: long, embedding: array<float>,
  * label: int)` table.
  *
  * Scale design:
  *   - the query set is broadcast (it is small by construction); the data
  *     side streams through a map-side cosine — no shuffle of embeddings;
  *   - top-k per query is a rank over (query, cosine): at 100 TB this
  *     becomes per-partition top-k + a k·|queries|-row merge, which is
  *     what TakeOrderedAndProject-style partial ranking gives; the window
  *     here ranks |queries|·n rows already reduced by the broadcast join;
  *   - the IVF variant prunes by partition label (cluster id from a
  *     pre-trained quantizer): probing one cell turns a full scan into a
  *     1/cells scan — the same pruning a partitioned table gives for free
  *     when the data is written partitioned by cell.
  */
object Similarity {

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * other vectors by cosine similarity (self excluded). */
  def knnBrute(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val scored = emb.crossJoin(q)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("cos"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF-style pruned top-k: only score vectors in the query's own cell
    * (`label`). One-probe IVF: recall trades against the 1/cells scan. */
  def knnIvf(emb: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("label").as("q_label")))
    val scored = emb.join(q, col("label") === col("q_label"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosine(col("q_emb"), col("embedding")).as("cos"))
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
    val a = emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val b = emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"), cosine(col("e_a"), col("e_b")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
