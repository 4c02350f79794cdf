package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.PlanExec
import org.apache.spark.sql.types._

/** Raw-buffer replacement for [[TopKByScoreVecAgg]] (r13, guide §1.2
  * "per-task work" + §4 "eliminate non-codegen row boxing in the hot
  * path"): the udaf/Aggregator form pays an ExpressionEncoder
  * round-trip per INPUT row — every scored candidate materializes a
  * boxed (Double, Long, Seq[Float]) tuple, converting the whole float
  * vector to a Scala Seq, before the top-k insert even looks at the
  * score. This TypedImperativeAggregate reads score and id primitively
  * from the input row, rejects below-threshold candidates BEFORE
  * touching the vector column, and copies the vector (one primitive
  * toFloatArray) only for the ≤ k accepted candidates per buffer.
  *
  * Semantics are bit-identical to TopKByScoreVecAgg: the same strict
  * (score DESC, id ASC) total order, associative/commutative merge,
  * same array<struct<_1,_2,_3>> output — pinned by the OpsSpec/
  * PropertySpec parity tests and the unchanged e10/e14/e15/e17 oracle
  * rows. State is three parallel primitive arrays (scores, ids, vecs),
  * serialized compactly for the partial-aggregate shuffle.
  */
final class TopKVecState(val k: Int) {
  // Geometric growth toward k (see TopKState): robust to an "uncapped"
  // k without preallocating k slots per group.
  private var cap = math.min(k, 16)
  var scores = new Array[Double](cap)
  var ids = new Array[Long](cap)
  var vecs = new Array[Array[Float]](cap)
  var n = 0

  def growIfNeeded(): Unit =
    if (n == cap && cap < k) ensureCap(if (cap > k / 2) k else cap * 2)

  /** Grow capacity to at least `target` (clamped to k) — used by insert
    * (geometric) and deserialize (exact n). */
  def ensureCap(target: Int): Unit = if (target > cap) {
    cap = math.max(16, math.min(k, target))
    scores = java.util.Arrays.copyOf(scores, cap)
    ids = java.util.Arrays.copyOf(ids, cap)
    vecs = java.util.Arrays.copyOf(vecs, cap)
  }
}

case class TopKByScoreVecRawAgg(k: Int, score: Expression, id: Expression,
    vec: Expression, mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKVecState] {

  override def children: Seq[Expression] = Seq(score, id, vec)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("_1", DoubleType, nullable = false),
    StructField("_2", LongType, nullable = false),
    StructField("_3", ArrayType(FloatType, containsNull = false)))),
    containsNull = false)

  override def createAggregationBuffer(): TopKVecState = new TopKVecState(k)

  @inline private def ahead(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  /** Insert (s, i, v) into the sorted-desc buffer; caller has already
    * established it beats the current last element (or the buffer has
    * room). */
  private def insert(b: TopKVecState, s: Double, i: Long, v: Array[Float]): Unit = {
    b.growIfNeeded()
    var p = if (b.n < k) { b.n += 1; b.n - 1 } else k - 1
    b.scores(p) = s; b.ids(p) = i; b.vecs(p) = v
    while (p > 0 && ahead(b.scores(p), b.ids(p), b.scores(p - 1), b.ids(p - 1))) {
      val ts = b.scores(p); b.scores(p) = b.scores(p - 1); b.scores(p - 1) = ts
      val ti = b.ids(p); b.ids(p) = b.ids(p - 1); b.ids(p - 1) = ti
      val tv = b.vecs(p); b.vecs(p) = b.vecs(p - 1); b.vecs(p - 1) = tv
      p -= 1
    }
  }

  override def update(b: TopKVecState, input: InternalRow): TopKVecState = {
    val so = score.eval(input)
    val io = id.eval(input)
    if (so != null && io != null) {
      val s = so.asInstanceOf[Double]
      val i = io.asInstanceOf[Long]
      if (b.n < k || ahead(s, i, b.scores(b.n - 1), b.ids(b.n - 1))) {
        val av = vec.eval(input)
        val arr = if (av == null) null else av.asInstanceOf[ArrayData].toFloatArray
        insert(b, s, i, arr)
      }
    }
    b
  }

  override def merge(b: TopKVecState, o: TopKVecState): TopKVecState = {
    var j = 0
    while (j < o.n) {
      val s = o.scores(j); val i = o.ids(j)
      if (b.n < k || ahead(s, i, b.scores(b.n - 1), b.ids(b.n - 1)))
        insert(b, s, i, o.vecs(j))
      j += 1
    }
    b
  }

  override def eval(b: TopKVecState): Any = {
    val out = new Array[Any](b.n)
    var j = 0
    while (j < b.n) {
      out(j) = new GenericInternalRow(Array[Any](b.scores(j), b.ids(j),
        if (b.vecs(j) == null) null
        else org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(b.vecs(j))))
      j += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKVecState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.n)
    var j = 0
    while (j < b.n) {
      out.writeDouble(b.scores(j)); out.writeLong(b.ids(j))
      val v = b.vecs(j)
      if (v == null) out.writeInt(-1)
      else {
        out.writeInt(v.length)
        var p = 0
        while (p < v.length) { out.writeFloat(v(p)); p += 1 }
      }
      j += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKVecState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val b = new TopKVecState(k)
    b.n = in.readInt()
    b.ensureCap(b.n)
    var j = 0
    while (j < b.n) {
      b.scores(j) = in.readDouble(); b.ids(j) = in.readLong()
      val len = in.readInt()
      if (len >= 0) {
        val v = new Array[Float](len)
        var p = 0
        while (p < len) { v(p) = in.readFloat(); p += 1 }
        b.vecs(j) = v
      }
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreVecRawAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreVecRawAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreVecRawAgg =
    copy(score = newChildren(0), id = newChildren(1), vec = newChildren(2))
  override def prettyName: String = "topk_by_score_vec_raw"
}

object TopKByScoreVecRawAgg {
  /** `topK(score, id, vec)` over a group → array<struct<_1,_2,_3>>
    * sorted by (score desc, id asc), length ≤ k; _3 is the candidate's
    * float vector. Drop-in for TopKByScoreVecAgg.column. */
  def column(k: Int, score: Column, id: Column, vec: Column): Column =
    PlanExec.column(TopKByScoreVecRawAgg(k, PlanExec.expression(score),
      PlanExec.expression(id), PlanExec.expression(vec)).toAggregateExpression())
}
