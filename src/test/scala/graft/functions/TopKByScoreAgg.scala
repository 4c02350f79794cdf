package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k by (score DESC, id ASC) as a typed Aggregator.
  *
  * This is the scale-safe shape for "k nearest per query": with
  * `row_number() OVER (PARTITION BY query_id ...)` the ENTIRE scored set
  * (corpus × queries rows) shuffles to be ranked and then all but k rows
  * per query are discarded — at 1B vectors × 1k queries that shuffle is
  * 10¹² rows. As an aggregate, the top-k state is a ≤k-element buffer
  * kept per (partition, query) map-side (partial ObjectHashAggregate),
  * so the shuffle carries at most `k × partitions` candidates per query
  * and executor memory is O(queries × k) for real.
  *
  * (score, id) is a total order, so the top-k set AND its order are
  * unique — output is deterministic under any partitioning/merge order.
  */
class TopKByScoreAgg(k: Int)
    extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {

  /** Strict "ranks ahead of": higher score first, lower id breaks ties. */
  private def ahead(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(acc: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    if (acc.length >= k && ahead(acc.last, x)) acc
    else {
      val i = acc.indexWhere(e => ahead(x, e))
      val ins = if (i < 0) acc :+ x else (acc.take(i) :+ x) ++ acc.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }

  override def zero: Seq[(Double, Long)] = Vector.empty
  override def reduce(acc: Seq[(Double, Long)], x: (Double, Long)): Seq[(Double, Long)] =
    insert(acc, x)
  override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    b.foldLeft(a)(insert)
  override def finish(acc: Seq[(Double, Long)]): Seq[(Double, Long)] = acc

  override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKByScoreAgg {
  /** Column form: `topK(score, id)` over a group → array<struct<_1,_2>>
    * sorted by (score desc, id asc), length ≤ k. */
  def column(k: Int, score: Column, id: Column): Column =
    udaf(new TopKByScoreAgg(k), ExpressionEncoder[(Double, Long)]())
      .apply(score, id)
}

/** [[TopKByScoreAgg]] carrying one Long payload per candidate (a label,
  * a cell id, …) through the bounded aggregate, so a consumer that needs
  * it avoids a join back to the corpus (the e18 fold: neighbor labels
  * ride the shuffle as 8 bytes/candidate instead of a second
  * broadcast-join pass over the corpus). Ordering is (score DESC, id
  * ASC) exactly as the payload-free form — ids are unique within a
  * group, so the payload never participates in ordering and the
  * selected set is identical. */
class TopKByScorePayloadAgg(k: Int)
    extends Aggregator[(Double, Long, Long), Seq[(Double, Long, Long)], Seq[(Double, Long, Long)]] {

  private def ahead(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(acc: Seq[(Double, Long, Long)],
      x: (Double, Long, Long)): Seq[(Double, Long, Long)] =
    if (acc.length >= k && ahead(acc.last, x)) acc
    else {
      val i = acc.indexWhere(e => ahead(x, e))
      val ins = if (i < 0) acc :+ x else (acc.take(i) :+ x) ++ acc.drop(i)
      if (ins.length > k) ins.take(k) else ins
    }

  override def zero: Seq[(Double, Long, Long)] = Vector.empty
  override def reduce(acc: Seq[(Double, Long, Long)],
      x: (Double, Long, Long)): Seq[(Double, Long, Long)] = insert(acc, x)
  override def merge(a: Seq[(Double, Long, Long)],
      b: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = b.foldLeft(a)(insert)
  override def finish(acc: Seq[(Double, Long, Long)]): Seq[(Double, Long, Long)] = acc

  override def bufferEncoder: Encoder[Seq[(Double, Long, Long)]] =
    ExpressionEncoder[Seq[(Double, Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
    ExpressionEncoder[Seq[(Double, Long, Long)]]()
}

object TopKByScorePayloadAgg {
  /** `topK(score, id, payload)` over a group → array<struct<_1,_2,_3>>
    * sorted by (score desc, id asc), length ≤ k. */
  def column(k: Int, score: Column, id: Column, payload: Column): Column =
    udaf(new TopKByScorePayloadAgg(k), ExpressionEncoder[(Double, Long, Long)]())
      .apply(score, id, payload)
}
