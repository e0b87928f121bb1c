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
      java.util.Arrays.sort(names.asInstanceOf[Array[Object]])
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

  private def writeNumber(node: JsonNode): String =
    if (node.isIntegralNumber) node.bigIntegerValue().toString
    else {
      val d = node.doubleValue()
      if (d == d.toLong && math.abs(d) < 1e15) d.toLong.toString + ".0"
      else d.toString
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
