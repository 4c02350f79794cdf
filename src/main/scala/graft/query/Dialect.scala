package graft.query

/** HEPop dialect normalization — string-level rewrites applied before the
  * real Spark SQL parse (replacing the reference's regex "parser",
  * query.js:67–141, with actual parsing; only true dialect deltas are
  * handled here, per SURVEY §7.4).
  */
object Dialect {

  /** DuckDB's zero-arg `count()` (reference loopback_test.sh:46) is not
    * valid Spark SQL — normalize to `count(*)`. */
  def normalize(sql: String): String =
    sql.replaceAll("(?i)\\bcount\\s*\\(\\s*\\)", "count(*)")
}
