package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators a training-data / event pipeline needs and
  * vanilla equi-join SQL can't express without a quadratic blow-up:
  * as-of (latest-state-at-time) and bounded time-proximity (range)
  * joins. Both are declared Spark-first as compositions whose only wide
  * operations are ONE hash exchange each — never a theta-join that
  * Catalyst would plan as BroadcastNestedLoop/Cartesian over the fact
  * table.
  */
object Joins {

  /** As-of join: for every left row, attach the single most recent right
    * row of the same `key` with `right.ts <= left.ts` (inclusive), or
    * nulls when none precedes it — the "state as of event time" lookup
    * (prices at trade time, latest profile at impression time).
    *
    * Shape: tag both inputs, UNION them, and run ONE running
    * `last(ignoreNulls)` window ordered by (ts, side) per key — right
    * rows sort before left rows at equal ts, which is exactly the
    * inclusive bound. This is the linear formulation: one exchange on
    * `key`, one in-partition sort, O(n) frame evaluation. The naive
    * `l JOIN r ON l.k = r.k AND r.ts <= l.ts` + argmax formulation
    * shuffles |l|·|r-per-key| pairs and degrades quadratically on hot
    * keys; at 100 TB the union form's cost is a single sort-shuffle of
    * (|l| + |r|), the same exchange a sessionization already pays.
    *
    * Contract: column names must be disjoint apart from `key`;
    * `right` must be unique per (key, rightTs) — pre-aggregate it
    * otherwise (ties would make "the" most recent row ill-defined in
    * any engine). Right payload travels as one struct, so the attached
    * columns always come from the SAME right row even when some of its
    * fields are null.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String): DataFrame = {
    val rPayload = right.columns.filterNot(_ == key).toSeq
    val lCols = left.columns.toSeq
    val rStructType = org.apache.spark.sql.types.StructType(
      rPayload.map(c => right.schema(right.schema.fieldIndex(c))))
    val lSide = left
      .withColumn("__t", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(rStructType))
      .select((Seq(col(key), col("__t"), col("__side"), col("__r")) ++
        lCols.filterNot(_ == key).map(col)): _*)
    val rSide = right
      .withColumn("__t", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(rPayload.map(col): _*))
      .select((Seq(col(key), col("__t"), col("__side"), col("__r")) ++
        lCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(left.schema.fieldIndex(c)).dataType).as(c))): _*)
    val w = Window.partitionBy(key).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = lSide.unionByName(rSide)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    rPayload.foldLeft(carried)((d, c) => d.withColumn(c, col(s"__r.$c")))
      .drop("__t", "__side", "__r")
  }

  /** Banded range join: all (left, right) pairs of the same `key` with
    * `left.ts + loSec <= right.ts <= left.ts + hiSec` — the temporal
    * interval join (errors near deploys, clicks around impressions;
    * `loSec = -tol, hiSec = tol` is the symmetric proximity join).
    *
    * Shape: banding. The window has width W = hiSec - loSec; both sides
    * map time to a W-wide integer bucket, the LEFT side is exploded to
    * the two buckets that can cover its window (`floor((t+lo)/W)` and
    * the next — a W-wide interval intersects at most two W-wide bins,
    * and a qualifying pair matches in EXACTLY one of them, so no dedup
    * pass is needed); then ONE equi-join on (key, bucket) + the exact
    * microsecond refine. Catalyst plans the naive BETWEEN form as a
    * per-key nested loop (quadratic on hot keys); banding keeps it an
    * O(matching-bucket pairs) hash/sort-merge equi-join whose fan-out
    * tracks the true temporal density — the standard interval-bucketing
    * shape that survives a 100× scale-up as long as the window stays
    * commensurate with event spacing.
    *
    * Contract: column names disjoint apart from `key`; inner-join
    * semantics (pairs only — for per-probe counts that must keep
    * zero-match probes, aggregate over a left variant like q30). Both
    * ts columns are kept; the exact delta is appended as `dt_us`
    * (right − left, negative when right precedes).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, loSec: Long, hiSec: Long): DataFrame = {
    require(hiSec > loSec, s"empty range [$loSec, $hiSec]")
    val loUs = loSec * 1000000L
    val wUs = (hiSec - loSec) * 1000000L
    val lb = left
      .withColumn("__b0", expr(s"(unix_micros($leftTs) + $loUs) div $wUs"))
      .withColumn("__b", explode(array(col("__b0"), col("__b0") + 1)))
      .drop("__b0")
    val rb = right.withColumn("__b", expr(s"unix_micros($rightTs) div $wUs"))
    lb.join(rb, Seq(key, "__b"))
      .withColumn("dt_us", unix_micros(col(rightTs)) - unix_micros(col(leftTs)))
      .where(col("dt_us") >= loUs && col("dt_us") <= loUs + wUs)
      .drop("__b")
  }
}
