package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fuzzy entity matching (edit distance ≤ 1) via the SymSpell/FastSS
  * deletion-neighborhood index — the scale-right alternative to running
  * a quadratic comparator inside blocks.
  *
  * Completeness argument for distance ≤ 1: if lev(a, b) ≤ 1 then either
  * a = b (share the identity variant), b inserts one char into a
  * (deleting it from b yields a), b deletes one char of a (deleting it
  * from a yields b), or b substitutes one char (deleting that position
  * from BOTH yields a common string). So every qualifying pair shares
  * at least one entry of {s} ∪ single-deletions(s) — candidates are
  * exactly the variant-key collisions, and an exact thresholded
  * levenshtein verifies them (false candidates cost one banded DP).
  *
  * Scale shape: the index is corpus × (len+1) rows — LINEAR, like the
  * shingle index — and the join key travels as an 8-byte xxhash64 of
  * (block, variant), never the string. No in-block product anywhere;
  * block skew shows up only as variant-bucket size, which deletion
  * variants keep tiny by construction.
  */
object FuzzyMatch {

  /** Unordered pairs (key_a < key_b) within edit distance 1, restricted
    * to equal `blockCol` (the cheap equality key, e.g. country). Output:
    * (key_a, key_b, dist). */
  def pairsWithin1(df: DataFrame, keyCol: String, strCol: String,
                   blockCol: String): DataFrame = {
    val variants = df
      .filter(col(keyCol).isNotNull && col(strCol).isNotNull &&
        col(blockCol).isNotNull)
      .select(col(blockCol), col(keyCol), col(strCol),
        explode(array_union(
          array(col(strCol)),
          // sequence(1, 0) would DESCEND for an empty string — guard it
          expr(s"""CASE WHEN length($strCol) = 0 THEN array()
                   ELSE transform(sequence(1, length($strCol)),
                     i -> concat(substring($strCol, 1, i - 1),
                                 substring($strCol, i + 1))) END""")))
          .as("__v"))
    val keyed = variants
      .select(col(blockCol), col(keyCol), col(strCol),
        xxhash64(col(blockCol), col("__v")).as("__vh"))
      .distinct()
    val a = keyed.select(col("__vh"), col(blockCol).as("block_a"),
      col(keyCol).as("key_a"), col(strCol).as("name_a"))
    val b = keyed.select(col("__vh"), col(blockCol).as("block_b"),
      col(keyCol).as("key_b"), col(strCol).as("name_b"))
    a.join(b, "__vh")
      // block equality re-checked: a cross-block xxhash64 collision must
      // not smuggle a pair past the blocking predicate
      .filter(col("key_a") < col("key_b") && col("block_a") === col("block_b"))
      .select("key_a", "key_b", "name_a", "name_b")
      .distinct() // a pair can collide on several variants — once only
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), 1))
      .filter(col("dist") >= 0) // -1 = past threshold (variant-hash FP)
      .select(col("key_a"), col("key_b"), col("dist"))
  }
}
