package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered semi-join — the sketch-based shuffle valve
  * for `big ⋉ small` when the small side is too large to broadcast as a
  * hash relation but its KEY SET compresses into a few KiB of bitmap.
  *
  * Pipeline: (1) fold the small side's keys into a `numWords`×64-bit
  * Bloom bitmap using only built-in partial-agg expressions — each key
  * explodes to `numHashes` (word, mask) probes, `bit_or` merges per
  * word, and at most `numWords` rows ever reach the driver (the same
  * bounded-sketch shipment as `HeavyHitters`); (2) prune the big side
  * MAP-SIDE with the bitmap inlined as an array literal (codegen'd
  * xxhash64 + shift/and — no UDF); (3) exact-verify the survivors with
  * a real left-semi join.
  *
  * False positives only cost verify work on a few extra rows; false
  * negatives are impossible (property-tested), so the result is
  * bit-identical to the plain semi join — but the shuffle into the
  * verify join carries only the survivors. At 100 TB this is the
  * difference between shuffling the full fact table and shuffling the
  * ~selectivity fraction of it; Spark's own runtime row-level filtering
  * applies the same idea when statistics trigger it — this operator
  * makes it explicit and deterministic.
  */
object BloomJoin {

  /** 64-entry single-bit mask lookup, inlined as a literal so the bit
    * test stays inside codegen (`shiftleft` needs a foldable shift). */
  private val MaskLut: Column = lit((0 until 64).map(1L << _).toArray)

  /** Bit positions of `key` under `numHashes` seeded xxhash64 probes
    * into `numWords`×64 bits. Shared by build and probe so the two
    * sides can never disagree on a position. */
  private def positions(key: Column, numWords: Int, numHashes: Int): Seq[Column] = {
    val bits = numWords.toLong * 64L
    (0 until numHashes).map(seed => pmod(xxhash64(key, lit(seed)), lit(bits)))
  }

  /** Build the bitmap of `df`'s non-null `keyCol` values. One scan,
    * partial-agg `bit_or`, ≤ `numWords` rows collected. */
  def buildBitmap(
      df: DataFrame,
      keyCol: String,
      numWords: Int,
      numHashes: Int): Array[Long] = {
    require(numWords > 0 && numHashes > 0,
      s"numWords/numHashes must be positive, got $numWords/$numHashes")
    val rows = df
      .filter(col(keyCol).isNotNull)
      .select(explode(array(positions(col(keyCol), numWords, numHashes): _*)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("w"),
        element_at(MaskLut, col("pos").bitwiseAND(lit(63L)).cast("int") + 1).as("mask"))
      .groupBy("w")
      .agg(expr("bit_or(mask)").as("m"))
      .collect()
    val words = new Array[Long](numWords)
    rows.foreach(r => words(r.getAs[Int]("w")) = r.getAs[Long]("m"))
    words
  }

  /** Membership predicate against a built bitmap: AND over the probe
    * bits, all built-in codegen'd expressions (the bitmap and mask LUT
    * ride along as array literals). */
  def mightContain(key: Column, bitmap: Array[Long], numHashes: Int): Column = {
    val bm = lit(bitmap)
    positions(key, bitmap.length, numHashes)
      .map { pos =>
        val word = element_at(bm, shiftright(pos, 6).cast("int") + 1)
        val mask = element_at(MaskLut, pos.bitwiseAND(lit(63L)).cast("int") + 1)
        word.bitwiseAND(mask) =!= lit(0L)
      }
      .reduce(_ && _)
  }

  /** `big ⋉ small` on `bigKey = smallKey`: Bloom-prune, then
    * exact-verify. Result ≡ `big.join(smallKeys, "left_semi")`. */
  def semiJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      numWords: Int = 256,
      numHashes: Int = 4): DataFrame = {
    val bitmap = buildBitmap(small, smallKey, numWords, numHashes)
    big
      .filter(mightContain(col(bigKey), bitmap, numHashes))
      .join(small.select(col(smallKey).as(bigKey)).distinct(), Seq(bigKey), "left_semi")
  }
}
