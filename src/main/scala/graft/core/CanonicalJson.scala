package graft.core

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{JsonNodeType, NullNode}

import scala.jdk.CollectionConverters._

/** Canonical JSON: compact serialization with lexicographically sorted
  * object keys, matching the reference's `json_dumps` (orjson with
  * OPT_SORT_KEYS; reference: src/ingest/utils.py:74-77). Sorted keys
  * make the serialized payloads hash-stable and compress better.
  *
  * Spark's built-in `to_json` preserves field order, so this lives as
  * a UDF-backed function instead (see graft.functions).
  */
object CanonicalJson {
  private val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)

  def tryParse(s: String): Option[JsonNode] =
    try Option(mapper.readTree(s)) catch { case _: Exception => None }

  /** Parse raw UTF-8 bytes without materializing a String — the hot
    * path for native expressions reading UTF8String columns.
    */
  def tryParseBytes(b: Array[Byte]): Option[JsonNode] =
    try Option(mapper.readTree(b)) catch { case _: Exception => None }

  /** Compact, sorted-keys serialization of a JSON string (re-encode). */
  def canonicalize(json: String): String = dumps(parse(json))

  def dumps(node: JsonNode): String = {
    val sb = new StringBuilder
    write(node, sb)
    sb.toString
  }

  /** `json_dumps_wrapping_primitive`: null → "{}", primitive p →
    * {"$value": p}, containers as-is (reference src/ingest/utils.py:79-95).
    */
  def dumpsWrappingPrimitive(node: JsonNode): String = {
    if (node == null || node.isNull) "{}"
    else if (node.isObject || node.isArray) dumps(node)
    else {
      val sb = new StringBuilder
      sb.append("{\"$value\":")
      write(node, sb)
      sb.append('}')
      sb.toString
    }
  }

  private def write(node: JsonNode, sb: StringBuilder): Unit = node.getNodeType match {
    case JsonNodeType.OBJECT =>
      sb.append('{')
      val names = node.fieldNames().asScala.toArray
      // sort by CODE POINT (like orjson/Python), not UTF-16 units —
      // they disagree when supplementary-plane keys (surrogate pairs)
      // meet keys in [U+E000, U+FFFF]
      java.util.Arrays.sort(names, codePointOrder)
      var first = true
      names.foreach { name =>
        if (!first) sb.append(',')
        first = false
        writeString(name, sb)
        sb.append(':')
        write(node.get(name), sb)
      }
      sb.append('}')
    case JsonNodeType.ARRAY =>
      sb.append('[')
      var first = true
      node.elements().asScala.foreach { el =>
        if (!first) sb.append(',')
        first = false
        write(el, sb)
      }
      sb.append(']')
    case JsonNodeType.STRING => writeString(node.textValue(), sb)
    case JsonNodeType.NUMBER => sb.append(writeNumber(node))
    case JsonNodeType.BOOLEAN => sb.append(if (node.booleanValue()) "true" else "false")
    case JsonNodeType.NULL | JsonNodeType.MISSING => sb.append("null")
    case other => throw new IllegalArgumentException(s"non-JSON node type $other")
  }

  private val codePointOrder: java.util.Comparator[String] =
    (a: String, b: String) => {
      val n = math.min(a.length, b.length)
      var i = 0
      var res = 0
      while (res == 0 && i < n) {
        val ca = a.codePointAt(i)
        val cb = b.codePointAt(i)
        if (ca != cb) res = Integer.compare(ca, cb)
        else i += Character.charCount(ca)
      }
      if (res != 0) res else Integer.compare(a.length, b.length)
    }

  private def writeNumber(node: JsonNode): String =
    if (node.isIntegralNumber) node.bigIntegerValue().toString
    else formatDouble(node.doubleValue())

  /** orjson/Python-`repr`-style double rendering: shortest round-trip
    * digits, fixed notation while the decimal exponent is in
    * [-4, 16), otherwise scientific with a lowercase `e` and a
    * two-digit signed exponent (`1e-07`, `1.5e+16`) — Java's native
    * `Double.toString` style ("1.0E-7") diverges from the reference's
    * payload bytes. Digits are taken from Java's shortest-decimal
    * output and re-formatted, so the only remaining deviation is
    * denormal-range values where pre-Ryū JDKs emit non-shortest
    * digits (e.g. 5e-324).
    */
  def formatDouble(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, s"non-finite double in JSON: $d")
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val s = java.lang.Double.toString(math.abs(d))
    val (mant, exp) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val decPoint = mant.indexOf('.')
    val digitsRaw = mant.substring(0, decPoint) + mant.substring(decPoint + 1)
    val leadZeros = digitsRaw.indexWhere(_ != '0') match {
      case -1 => digitsRaw.length
      case i => i
    }
    // value = digits[0].digits[1:] × 10^e
    val e = decPoint - 1 - leadZeros + exp
    val digits = digitsRaw.substring(leadZeros).reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case t => t
    }
    val sb = new StringBuilder
    if (neg) sb.append('-')
    if (e >= -4 && e < 16) {
      if (e >= digits.length - 1)
        sb.append(digits).append("0" * (e - digits.length + 1)).append(".0")
      else if (e >= 0)
        sb.append(digits.substring(0, e + 1)).append('.').append(digits.substring(e + 1))
      else
        sb.append("0.").append("0" * (-e - 1)).append(digits)
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits.substring(1))
      sb.append('e').append(if (e >= 0) '+' else '-')
      val ae = math.abs(e)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    }
    sb.toString
  }

  private def writeString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }

  /** null node helper for callers building wrapped values. */
  def nullNode: JsonNode = NullNode.getInstance()
}
