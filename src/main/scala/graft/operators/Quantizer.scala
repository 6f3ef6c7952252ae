package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF coarse quantizer: train k cell centroids over the embedding
  * corpus (MLlib KMeans) and assign every vector its nearest cell — the
  * index-construction half of [[Similarity.knnIvf]], which then probes
  * only the query's cell (1/k of the corpus per query).
  *
  * Scale notes:
  *   - training samples the corpus (`fit` on a `sampleFraction` — a
  *     coarse quantizer needs cluster SHAPE, not every point; IVF
  *     systems train on 1–10 % routinely);
  *   - assignment is one map-side `transform` pass — no shuffle; at
  *     100 TB the assignment writes `partitionBy("cell")`, so cell
  *     probing becomes partition pruning (see SURVEY §8 bucketing row);
  *   - fixed seed → deterministic centroids → reproducible cell ids.
  */
object Quantizer {

  /** (embeddings + `cell` column, k centroid arrays).
    *
    * DISTANCE-MEASURE CONTRACT (review r18): assignment here uses
    * `distanceMeasure` (KMeans' default "euclidean"), while
    * [[SemanticDedup.assignCells]] assigns by COSINE argmax — for
    * un-normalized embeddings the two argmins disagree, so a corpus
    * assigned HERE must not be mixed with batches assigned THERE
    * against the same centroids (a near-duplicate pair split across
    * cells is silently never compared). When feeding these centroids
    * to the SemanticDedup incremental path, either pass
    * distanceMeasure = "cosine" so both sides rank identically, or
    * re-assign the base with assignCells; on L2-normalized embeddings
    * the orders coincide and either works. The in-repo multi-probe
    * serve path ([[Similarity.knnIvfMultiProbe]]) is
    * Euclidean-consistent with the default. */
  def trainAndAssign(emb: DataFrame, k: Int, seed: Long = 42L,
                     sampleFraction: Double = 1.0,
                     distanceMeasure: String = "euclidean")
  : (DataFrame, Array[Array[Float]]) = {
    val featurized = emb.withColumn("features", array_to_vector(col("embedding")))
    val trainSet =
      if (sampleFraction >= 1.0) featurized
      else featurized.sample(withReplacement = false, sampleFraction, seed)
    val model = new KMeans()
      .setK(k).setSeed(seed).setFeaturesCol("features").setPredictionCol("cell")
      .setDistanceMeasure(distanceMeasure)
      .fit(trainSet)
    val assigned = model.transform(featurized).drop("features")
    val centroids = model.clusterCenters.map(_.toArray.map(_.toFloat))
    (assigned, centroids)
  }
}
