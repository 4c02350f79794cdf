package graft.ingest

import scala.collection.mutable

/** InfluxDB Line Protocol parser/formatter.
  *
  * Grammar: `measurement[,tag=v...] field=v[,field=v...] [ns-timestamp]`
  * (reference lineproto.js:62–93). Value lexing per lineproto.js:27–48:
  * `123i` → long, `t/T/true/TRUE/f/F/false/FALSE` → boolean, `"..."` →
  * string, otherwise float; unparseable → dropped field.
  *
  * Unlike the reference's naive `split(' ')`, this parser handles the
  * published escape rules (`\ ` `\,` `\=` inside identifiers/tags, `\"`
  * inside quoted strings) — a strict superset of the reference's accepted
  * inputs, required for property-tested `parse ∘ format = id`.
  */
object LineProtocol {

  sealed trait FieldValue { def asAny: Any }
  final case class LpLong(v: Long) extends FieldValue { def asAny: Any = v }
  final case class LpDouble(v: Double) extends FieldValue { def asAny: Any = v }
  final case class LpBool(v: Boolean) extends FieldValue { def asAny: Any = v }
  final case class LpString(v: String) extends FieldValue { def asAny: Any = v }

  /** One parsed point. `timestampNs = None` means the caller stamps "now"
    * (reference addTimestamp:true, hepop.js:1065–1069). */
  final case class Point(
      measurement: String,
      tags: Seq[(String, String)],
      fields: Seq[(String, FieldValue)],
      timestampNs: Option[Long])

  /** Lex one field value (reference lineproto.js:27–48). */
  def lexValue(raw: String): Option[FieldValue] = {
    if (raw.isEmpty) return None
    if (raw.length >= 2 && raw.head == '"' && raw.last == '"')
      return Some(LpString(unescapeQuoted(raw.substring(1, raw.length - 1))))
    raw match {
      case "t" | "T" | "true" | "True" | "TRUE" => Some(LpBool(true))
      case "f" | "F" | "false" | "False" | "FALSE" => Some(LpBool(false))
      case s if s.last == 'i' || s.last == 'u' =>
        try Some(LpLong(java.lang.Long.parseLong(s.dropRight(1))))
        catch { case _: NumberFormatException => None }
      case s =>
        try Some(LpDouble(java.lang.Double.parseDouble(s)))
        catch { case _: NumberFormatException => None }
    }
  }

  private def unescapeQuoted(s: String): String =
    s.replace("\\\"", "\"").replace("\\\\", "\\")

  /** Split on `sep` respecting backslash escapes (and double quotes when
    * `quoted`); returns raw segments with escapes intact. */
  private def splitEscaped(s: String, sep: Char, quoted: Boolean): Seq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    var inQ = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur.append(c).append(s.charAt(i + 1)); i += 2 }
      else {
        if (quoted && c == '"') inQ = !inQ
        if (c == sep && !inQ) { out += cur.result(); cur.clear() }
        else cur.append(c)
        i += 1
      }
    }
    out += cur.result()
    out.toSeq
  }

  private def unescapeIdent(s: String): String =
    s.replace("\\,", ",").replace("\\=", "=").replace("\\ ", " ").replace("\\\\", "\\")

  /** Parse one line; None for blank/comment/garbage lines. */
  def parse(line: String): Option[Point] = {
    val trimmed = line.trim
    if (trimmed.isEmpty || trimmed.startsWith("#")) return None
    val sections = splitEscaped(trimmed, ' ', quoted = true).filter(_.nonEmpty)
    if (sections.length < 2) return None

    val keyPart = splitEscaped(sections.head, ',', quoted = false)
    val measurement = unescapeIdent(keyPart.head)
    if (measurement.isEmpty) return None
    val tags = keyPart.tail.flatMap { kv =>
      splitEscaped(kv, '=', quoted = false) match {
        case Seq(k, v) if k.nonEmpty => Some(unescapeIdent(k) -> unescapeIdent(v))
        case _ => None
      }
    }

    val fields = splitEscaped(sections(1), ',', quoted = true).flatMap { kv =>
      splitEscaped(kv, '=', quoted = true) match {
        case Seq(k, v) if k.nonEmpty =>
          lexValue(v).map(unescapeIdent(k) -> _)
        case _ => None
      }
    }
    if (fields.isEmpty) return None

    // ns timestamp (reference converts ns→ms at lineproto.js:86–88; we keep
    // ns and convert at the appender so the manifest stays ns-accurate).
    val ts = sections.drop(2).headOption.flatMap { raw =>
      try Some(raw.toLong) catch { case _: NumberFormatException => None }
    }
    Some(Point(measurement, tags, fields, ts))
  }

  /** Parse a /write body: one point per line (reference hepop.js:1062–1076). */
  def parseBody(body: String): Seq[Point] =
    body.split('\n').toSeq.flatMap(l => parse(l))

  private def escapeIdent(s: String): String =
    s.replace("\\", "\\\\").replace(",", "\\,").replace("=", "\\=").replace(" ", "\\ ")

  private def formatValue(v: FieldValue): String = v match {
    case LpLong(l) => s"${l}i"
    case LpDouble(d) => d.toString
    case LpBool(b) => if (b) "t" else "f"
    case LpString(s) => "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  }

  /** Inverse of parse (reference lineproto.js:95–114). */
  def format(p: Point): String = {
    val key = (escapeIdent(p.measurement) +:
      p.tags.map { case (k, v) => s"${escapeIdent(k)}=${escapeIdent(v)}" }).mkString(",")
    val fields = p.fields
      .map { case (k, v) => s"${escapeIdent(k)}=${formatValue(v)}" }.mkString(",")
    (Seq(key, fields) ++ p.timestampNs.map(_.toString)).mkString(" ")
  }
}
