package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Vector similarity semantics: the custom vec_dot expression + kNN. */
class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  private lazy val vectors = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f, 0.0f), 0),
    (2L, Array(1.0f, 1.0f, 0.0f), 0),
    (3L, Array(-1.0f, 0.0f, 0.0f), 1),
    (4L, Array(0.9f, 0.1f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("vec_dot matches hand computation (interpreted and codegen paths)") {
    val r = vectors.filter($"vec_id" === 2)
      .select(VectorFunctions.vecDot($"embedding", $"embedding")).head().getDouble(0)
    assert(r === 2.0)
    // SQL route through the registered function
    vectors.createOrReplaceTempView("v")
    val viaSql = spark.sql(
      "SELECT vec_dot(embedding, embedding) FROM v WHERE vec_id = 2").head().getDouble(0)
    assert(viaSql === 2.0)
  }

  test("cosine: identical → 1, orthogonal → 0, opposite → -1") {
    val cos = vectors.as("a").crossJoin(vectors.as("b"))
      .select($"a.vec_id".as("x"), $"b.vec_id".as("y"),
        VectorFunctions.cosine($"a.embedding", $"b.embedding").as("c"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(math.abs(cos((0L, 0L)) - 1.0) < 1e-12)
    assert(cos((0L, 1L)) === 0.0)
    assert(cos((0L, 3L)) === -1.0)
  }

  test("knnBrute ranks by cosine desc, excludes self") {
    val knn = Similarity.knnBrute(vectors, vectors.filter($"vec_id" === 0), 2)
      .orderBy("rank").collect()
    assert(knn.length === 2)
    assert(knn(0).getAs[Long]("neighbor_id") === 4L) // cos ≈ 0.994
    assert(knn(1).getAs[Long]("neighbor_id") === 2L) // cos ≈ 0.707
    assert(!knn.exists(_.getAs[Long]("neighbor_id") == 0L))
  }

  test("knnIvf only searches the query's own cell") {
    val knn = Similarity.knnIvf(vectors, vectors.filter($"vec_id" === 0), 5)
      .collect()
    val neighbors = knn.map(_.getAs[Long]("neighbor_id")).toSet
    assert(neighbors === Set(1L, 2L)) // label 0 only, self excluded
  }

  test("cosinePairs returns symmetric-unique pairs above threshold") {
    val pairs = Similarity.cosinePairs(vectors, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 4L)))
    assert(pairs.forall { case (a, b) => a < b })
  }
}
