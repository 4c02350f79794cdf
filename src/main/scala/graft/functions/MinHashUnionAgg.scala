package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed Aggregator unioning MinHash signatures: the element-wise min of
  * per-document signatures IS the signature of the union of their shingle
  * sets — so one pass over a group yields a constant-size sketch of the
  * whole group's vocabulary, and two groups' similarity is estimated by
  * the fraction of matching components.
  *
  * This is the mergeable-sketch shape that scales: partial aggregation
  * combines signatures map-side (`merge` is associative/commutative), the
  * shuffle carries 64 longs per group regardless of group size, and
  * sketches of different partitions/days can be unioned later without
  * revisiting the data.
  */
object MinHashUnionAgg extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  val NumHashes = 64

  override def zero: Array[Long] = Array.fill(NumHashes)(Long.MaxValue)

  override def reduce(acc: Array[Long], sig: Array[Long]): Array[Long] = {
    var i = 0
    val n = math.min(acc.length, sig.length)
    while (i < n) { if (sig(i) < acc(i)) acc(i) = sig(i); i += 1 }
    acc
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = reduce(a, b)

  override def finish(acc: Array[Long]): Array[Long] = acc

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()

  /** Column form: `minhashUnion(sigCol)` over a group. */
  def column(sig: Column): Column = udaf(this, ExpressionEncoder[Array[Long]]()).apply(sig)
}
