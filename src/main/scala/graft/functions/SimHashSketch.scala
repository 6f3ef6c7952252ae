package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** 64-bit SimHash as a single typed aggregate over `(token_hash, tf)`
  * rows: one `Array[Long]` of 64 signed bit-sums per group, finished into
  * the packed signature long.
  *
  * Same rationale as [[MinHashSketch]]: the column-per-bit formulation
  * (64 conditional `sum` slots + a 64-term packing projection) generates
  * a Janino class whose compile time dominates cold runs; the typed
  * buffer keeps the plan small and the update loop branch-light.
  */
class SimHashSketch extends Aggregator[(Long, Long), Array[Long], Long]
    with Serializable {

  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val (th, tf) = in
    var i = 0
    while (i < 64) {
      // +tf when bit i of the token hash is set, −tf otherwise
      buf(i) += (if (((th >>> i) & 1L) == 1L) tf else -tf)
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var sig = 0L
    var i = 0
    while (i < 64) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
