package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns. AQE's skew-join handling covers joins at
  * runtime; heavy-hitter GROUP BY keys need the two-phase salted
  * aggregate below (one hot key otherwise lands every row on one
  * reducer, which is the classic 100 TB stall).
  */
object Skew {

  /** Two-phase salted aggregation for decomposable aggregates: phase 1
    * groups by (key, salt) — the hot key's rows spread over `salts`
    * reducers — phase 2 re-aggregates partials by key. Results are
    * identical to a direct groupBy (count/sum are associative), so the
    * declared query's oracle is the PLAIN GROUP BY.
    *
    * `saltCol` must be deterministic per row (not rand()!) so retried
    * tasks and the DuckDB comparison stay stable; a hash of a unique row
    * id modulo `salts` is the standard choice.
    */
  def saltedCountSum(df: DataFrame, key: Column, saltSource: Column,
      valueCol: Column, salts: Int = 8): DataFrame =
    // Partials sum as scaled integers (StableAgg.sumMicros shape) so the
    // two-phase result is exactly the plain-GROUP-BY oracle regardless of
    // salt/merge order — and the output is a hash-immune BIGINT.
    df.groupBy(key.as("k"), (abs(hash(saltSource)) % salts).as("salt"))
      .agg(count(lit(1)).as("pc"),
        sum((valueCol.cast("decimal(18,6)") * lit(1000000)).cast("long")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("s_micros"))
}
