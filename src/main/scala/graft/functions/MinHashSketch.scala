package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** MinHash sketch as a single typed aggregate: one `Array[Long]` buffer
  * holding all `numHashes` minima, updated in a tight JVM loop.
  *
  * Why not `numHashes` separate `min(...)` aggregate columns? That
  * formulation generates one enormous Janino class (64 aggregate slots ×
  * update/merge code) whose compilation dominates cold wall-clock, and
  * its shuffle rows carry 64 named columns. Here the buffer is one long
  * array (serialized compactly by the encoder), the update is
  * `buf(i) = min(buf(i), rehash(h, i))` — branch-free per slot — and the
  * generated plan stays small no matter how wide the signature.
  *
  * The slot rehash is a splitmix64 finalization of `h + GOLDEN·(i+1)` —
  * deterministic across JVMs/partitions (task retries see identical
  * sketches), uniform per slot, and independent of Spark's SQL hash
  * functions (the LSH contract only needs a fixed universal family).
  */
class MinHashSketch(val numHashes: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  @inline private def rehash(h: Long, i: Int): Long = {
    var z = h + 0x9E3779B97F4A7C15L * (i + 1)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val v = rehash(h, i)
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
