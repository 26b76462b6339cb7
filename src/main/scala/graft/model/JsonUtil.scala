package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Canonical value→string boundary, byte-compatible with Python's
  * `json.dumps(..., ensure_ascii=False, indent=2)` as used by the
  * reference's `json2str_kv`
  * (/root/reference/src/python/instructionspipe/utils.py:10-17):
  * strings pass through unchanged; everything else pretty-prints with
  * 2-space indent, `": "` key separator, `","` item separator, and
  * non-ASCII kept literal.
  */
object JsonUtil {

  /** Parse a JSON document into json4s AST (field order preserved). */
  def parse(s: String): JValue = JsonMethods.parse(s)

  /** Python-style pretty print (indent=2, ensure_ascii=False). */
  def pretty(jv: JValue): String = {
    val sb = new StringBuilder
    render(jv, 0, sb)
    sb.toString
  }

  /** The reference's json2str_kv: top-level fields of a JSON object →
    * Map[name → stringified value], strings kept as-is. */
  def json2strKv(jv: JValue): Map[String, String] = jv match {
    case JObject(fields) =>
      // LinkedHashMap-backed to preserve insertion order like a dict
      scala.collection.immutable.ListMap(fields.map {
        case (k, JString(s)) => k -> s
        case (k, v)          => k -> pretty(v)
      }: _*)
    case other => throw new IllegalArgumentException(s"expected object, got $other")
  }

  private def render(jv: JValue, depth: Int, sb: StringBuilder): Unit = {
    val pad = "  " * (depth + 1)
    val close = "  " * depth
    jv match {
      case JNull | JNothing => sb.append("null")
      case JBool(b)         => sb.append(if (b) "true" else "false")
      case JInt(i)          => sb.append(i.toString)
      case JLong(l)         => sb.append(l.toString)
      case JDouble(d)       => sb.append(formatDouble(d))
      case JDecimal(d)      => sb.append(d.toString)
      case JString(s)       => renderString(s, sb)
      case JArray(Nil)      => sb.append("[]")
      case JArray(xs) =>
        sb.append("[\n")
        xs.zipWithIndex.foreach { case (x, i) =>
          sb.append(pad); render(x, depth + 1, sb)
          if (i < xs.size - 1) sb.append(',')
          sb.append('\n')
        }
        sb.append(close).append(']')
      case JObject(Nil) => sb.append("{}")
      case JObject(fields) =>
        sb.append("{\n")
        fields.zipWithIndex.foreach { case ((k, v), i) =>
          sb.append(pad); renderString(k, sb); sb.append(": ")
          render(v, depth + 1, sb)
          if (i < fields.size - 1) sb.append(',')
          sb.append('\n')
        }
        sb.append(close).append('}')
      case JSet(xs) => render(JArray(xs.toList), depth, sb)
    }
  }

  /** Python repr-ish doubles: integral values as "x.0". */
  private def formatDouble(d: Double): String =
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e16) {
      if (d == d.toLong.toDouble) s"${d.toLong}.0" else d.toString
    } else d.toString

  private def renderString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c) // ensure_ascii=False: non-ASCII stays literal
    }
    sb.append('"')
  }
}
