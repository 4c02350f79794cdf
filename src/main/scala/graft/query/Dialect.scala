package graft.query

/** HEPop dialect normalization — string-level rewrites applied before the
  * real Spark SQL parse (replacing the reference's regex "parser",
  * query.js:67–141, with actual parsing; only true dialect deltas are
  * handled here, per SURVEY §7.4).
  */
object Dialect {

  private val CountNoArg = "(?i)\\bcount\\s*\\(\\s*\\)".r

  /** DuckDB's zero-arg `count()` (reference loopback_test.sh:46) is not
    * valid Spark SQL — normalize to `count(*)`.
    *
    * The rewrite is applied only OUTSIDE single-quoted string literals
    * (VERDICT r1 #6: `WHERE payload LIKE '%count()%'` must survive
    * untouched). SQL escapes quotes by doubling (''), which this scanner
    * handles naturally: the doubled quote re-enters literal mode for the
    * second half and the char between is never rewritten anyway.
    */
  def normalize(sql: String): String = {
    val out = new StringBuilder(sql.length)
    val seg = new StringBuilder
    var inQuote = false
    def flushSeg(): Unit = {
      out.append(CountNoArg.replaceAllIn(seg.result(), "count(*)"))
      seg.setLength(0)
    }
    sql.foreach { c =>
      if (c == '\'') {
        if (!inQuote) flushSeg() else { out.append(seg); seg.setLength(0) }
        out.append(c)
        inQuote = !inQuote
      } else seg.append(c)
    }
    if (inQuote) out.append(seg) else flushSeg()
    out.result()
  }
}
