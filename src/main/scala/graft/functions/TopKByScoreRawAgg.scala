package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.PlanExec
import org.apache.spark.sql.types._

/** Raw-buffer top-k state shared by [[TopKByScoreRawAgg]] (payload-free)
  * and [[TopKByScorePayloadRawAgg]] (one Long payload per candidate) —
  * the r13 per-task-work fix for the udaf/Aggregator forms, which paid
  * an ExpressionEncoder round-trip (boxed tuple per input ROW) on every
  * scored candidate before the insert looked at the score. The raw
  * TypedImperativeAggregate reads primitives straight off the input row
  * and rejects below-threshold candidates with two comparisons. The
  * selection ((score DESC, id ASC) strict total order), merge algebra,
  * and array<struct> output are identical to the udaf forms — pinned by
  * the PropertySpec equivalence tests and the unchanged oracle rows of
  * every consumer (e1/e2/e4/e13/e16/e8/e18, s9/s10, mmr shortlist). */
final class TopKState(val k: Int, val hasPayload: Boolean) {
  require(k > 0, s"TopKState k=$k out of range")
  // Capacity grows geometrically toward k: callers may pass an
  // "uncapped" k (e.g. the OpsSpec brute-force reference uses
  // k = Int.MaxValue), which the superseded Aggregator form handled by
  // growing a Vector — preallocating Array(k) here would be an
  // allocation of k elements regardless of the group's actual size.
  private var cap = math.min(k, 16)
  var scores = new Array[Double](cap)
  var ids = new Array[Long](cap)
  var pay: Array[Long] = if (hasPayload) new Array[Long](cap) else null
  var n = 0

  @inline def ahead(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  private def grow(): Unit = ensureCap(if (cap > k / 2) k else cap * 2)

  /** Grow capacity to at least `target` (clamped to k) — used by insert
    * (geometric) and deserialize (exact n, which the initial 16-slot
    * arrays cannot hold). */
  def ensureCap(target: Int): Unit = if (target > cap) {
    cap = math.max(16, math.min(k, target))
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
    if (hasPayload) pay = java.util.Arrays.copyOf(pay, cap)
  }

  def insert(s: Double, i: Long, p: Long): Unit = {
    if (n == k && !ahead(s, i, scores(n - 1), ids(n - 1))) return
    if (n == cap && cap < k) grow()
    var q = if (n < k) { n += 1; n - 1 } else k - 1
    scores(q) = s; ids(q) = i
    if (hasPayload) pay(q) = p
    while (q > 0 && ahead(scores(q), ids(q), scores(q - 1), ids(q - 1))) {
      val ts = scores(q); scores(q) = scores(q - 1); scores(q - 1) = ts
      val ti = ids(q); ids(q) = ids(q - 1); ids(q - 1) = ti
      if (hasPayload) { val tp = pay(q); pay(q) = pay(q - 1); pay(q - 1) = tp }
      q -= 1
    }
  }

  def mergeFrom(o: TopKState): Unit = {
    var j = 0
    while (j < o.n) {
      insert(o.scores(j), o.ids(j), if (hasPayload) o.pay(j) else 0L)
      j += 1
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var j = 0
    while (j < n) {
      out.writeDouble(scores(j)); out.writeLong(ids(j))
      if (hasPayload) out.writeLong(pay(j))
      j += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object TopKState {
  def deserialize(bytes: Array[Byte], k: Int, hasPayload: Boolean): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKState(k, hasPayload)
    b.n = in.readInt()
    b.ensureCap(b.n)
    var j = 0
    while (j < b.n) {
      b.scores(j) = in.readDouble(); b.ids(j) = in.readLong()
      if (hasPayload) b.pay(j) = in.readLong()
      j += 1
    }
    b
  }
}

/** Drop-in raw replacement for TopKByScoreAgg.column — see [[TopKState]]. */
case class TopKByScoreRawAgg(k: Int, score: Expression, id: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKState = new TopKState(k, hasPayload = false)

  override def update(b: TopKState, input: InternalRow): TopKState = {
    val so = score.eval(input)
    val io = id.eval(input)
    if (so != null && io != null)
      b.insert(so.asInstanceOf[Double], io.asInstanceOf[Long], 0L)
    b
  }

  override def merge(b: TopKState, o: TopKState): TopKState = { b.mergeFrom(o); b }

  override def eval(b: TopKState): Any = {
    val out = new Array[Any](b.n)
    var j = 0
    while (j < b.n) {
      out(j) = new GenericInternalRow(Array[Any](b.scores(j), b.ids(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TopKState =
    TopKState.deserialize(bytes, k, hasPayload = false)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreRawAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreRawAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreRawAgg =
    copy(score = newChildren(0), id = newChildren(1))
  override def prettyName: String = "topk_by_score_raw"
}

object TopKByScoreRawAgg {
  def column(k: Int, score: Column, id: Column): Column =
    PlanExec.column(TopKByScoreRawAgg(k, PlanExec.expression(score),
      PlanExec.expression(id)).toAggregateExpression())
}

/** Drop-in raw replacement for TopKByScorePayloadAgg.column — see
  * [[TopKState]]; payload rides selection-neutrally as in the udaf form. */
case class TopKByScorePayloadRawAgg(k: Int, score: Expression, id: Expression,
    payload: Expression, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKState] {

  override def children: Seq[Expression] = Seq(score, id, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", LongType, nullable = false),
    StructField("_3", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKState = new TopKState(k, hasPayload = true)

  override def update(b: TopKState, input: InternalRow): TopKState = {
    val so = score.eval(input)
    val io = id.eval(input)
    if (so != null && io != null) {
      val s = so.asInstanceOf[Double]
      val i = io.asInstanceOf[Long]
      if (b.n < k || b.ahead(s, i, b.scores(b.n - 1), b.ids(b.n - 1))) {
        val po = payload.eval(input)
        b.insert(s, i, if (po == null) 0L else po.asInstanceOf[Long])
      }
    }
    b
  }

  override def merge(b: TopKState, o: TopKState): TopKState = { b.mergeFrom(o); b }

  override def eval(b: TopKState): Any = {
    val out = new Array[Any](b.n)
    var j = 0
    while (j < b.n) {
      out(j) = new GenericInternalRow(Array[Any](b.scores(j), b.ids(j), b.pay(j)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKState): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): TopKState =
    TopKState.deserialize(bytes, k, hasPayload = true)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScorePayloadRawAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScorePayloadRawAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScorePayloadRawAgg =
    copy(score = newChildren(0), id = newChildren(1), payload = newChildren(2))
  override def prettyName: String = "topk_by_score_payload_raw"
}

object TopKByScorePayloadRawAgg {
  def column(k: Int, score: Column, id: Column, payload: Column): Column =
    PlanExec.column(TopKByScorePayloadRawAgg(k, PlanExec.expression(score),
      PlanExec.expression(id), PlanExec.expression(payload)).toAggregateExpression())
}
