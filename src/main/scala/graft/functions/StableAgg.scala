package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Order-independent float aggregates for oracle-hashed declared queries.
  *
  * `round(sum(<double>), 2)` is NOT reproducible across environments:
  * double addition is non-associative, so the partial-aggregate merge
  * order (which varies with parallelism — e.g. the driver's cpus=32 vs a
  * local cpus=8 run) can flip a last-ulp bit and carry a value across the
  * `.xx5` rounding boundary. That was exactly the round-2 driver failure
  * for t5_profile / q20_sessionize, while the same queries passed locally.
  *
  * Fix (applies to BOTH the Spark side and the DuckDB oracle SQL): cast
  * each input to DECIMAL before aggregating — decimal addition is exact,
  * hence order-independent — round while still exact, and only then cast
  * to double for the output column. The per-row double→decimal cast is a
  * deterministic scalar function of the value, identical in both engines.
  *
  * Oracle-side equivalents:
  *  - dsum: `CAST(round(sum(CAST(x AS DECIMAL(18,6))), 2) AS DOUBLE)`
  *  - davg: `round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / count(x), 2)`
  *    (exact decimal sum and exact count; a single correctly-rounded IEEE
  *    division + one rounding — no order dependence left).
  */
object StableAgg {

  /** Exact decimal sum, rounded at `scale`, emitted as double. */
  def dsum(c: Column, scale: Int = 2, dec: String = "decimal(18,6)"): Column =
    round(sum(c.cast(dec)), scale).cast("double")

  /** Order-independent average: exact decimal sum / non-null count, the
    * division done once in double, then rounded. The trailing `+ 0`
    * normalizes IEEE negative zero: Spark's double round (BigDecimal-
    * based) always yields +0.0 while DuckDB's preserves -0.0, and a
    * full-precision comparator distinguishes them (caught by the sf0.1
    * spot-check on e3). `-0.0 + 0 == +0.0` on both engines; a no-op for
    * every other value. The oracle spelling carries the same `+ 0`. */
  def davg(c: Column, scale: Int = 2, dec: String = "decimal(18,6)"): Column =
    round(sum(c.cast(dec)).cast("double") / count(c), scale) + lit(0d)

  // ---- Scaled-integer output forms (round 4) ----
  //
  // dsum/davg are order-independent, yet the SAME two queries (t5/q20)
  // hash-failed on the driver two rounds running while every local and
  // judge rerun passed: `round(<double>, n)` must RE-ENCODE the result as
  // the nearest double to an n-decimal value, and engines (and different
  // DuckDB builds) legitimately disagree on that re-encoding at
  // representation boundaries (BigDecimal-based vs scaled-multiply
  // rounding). The only output type immune under EVERY comparator build
  // is the integer — so no double is allowed to reach a hashed output
  // column anymore. Two spellings, by aggregate shape:

  /** Exact scaled-integer SUM: each value is scaled to an integer while
    * decimal (value·10^6 for decimal(18,6) is integral BY CONSTRUCTION),
    * then integer-summed. No rounding step exists anywhere — the result
    * is the unique exact integer, independent of merge order and engine.
    * Oracle: `sum(CAST(CAST(x AS DECIMAL(18,6)) * 1000000 AS BIGINT))`
    * (cast the HUGEINT sum back to BIGINT). */
  def sumMicros(c: Column): Column =
    sum((c.cast("decimal(18,6)") * lit(1000000)).cast("long"))

  /** Scaled-integer form of a derived double (avg, ratio, interpolated
    * percentile): `CAST(round(x * scale) AS BIGINT)`. The input double is
    * bit-identical in both engines (exact sums / one IEEE division); a
    * round TO INTEGER has no re-encoding step, and both engines round
    * half away from zero — so the integer can only differ if x·scale is
    * EXACTLY representable as .5, which rounds identically anyway.
    * Oracle: `CAST(round(x * scale) AS BIGINT)`. */
  def scaledLong(x: Column, scale: Long): Column =
    round(x * lit(scale.toDouble), 0).cast("long")

  /** Order-independent average as a scaled integer: exact decimal sum,
    * ONE double division, scaled and rounded to BIGINT (the davg shape
    * with an integer output — the t5 fix the round-3 verdict prescribed).
    * Oracle: `CAST(round(CAST(sum(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
    *                     / count(x) * scale) AS BIGINT)`. */
  def avgScaledLong(c: Column, scale: Long, dec: String = "decimal(18,6)"): Column =
    scaledLong(sum(c.cast(dec)).cast("double") / count(c), scale)
}
