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
}
