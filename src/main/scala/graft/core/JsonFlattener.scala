package graft.core

import com.fasterxml.jackson.databind.JsonNode

import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Flattened feature value: JSON numbers/booleans become doubles
  * (bool → 1.0/0.0, exactly how the reference encodes them downstream),
  * strings stay strings until string-table encoding.
  */
sealed trait FlatValue
object FlatValue {
  final case class Num(value: Double) extends FlatValue
  final case class Str(value: String) extends FlatValue
}

/** Recursive JSON → flat dot-path map, mirroring the reference's
  * feature flattener (src/trainer/code/feature_flattener.py:22-63):
  *
  *   - null, {} and [] are dropped (missing features);
  *   - numbers / booleans / strings are kept as-is;
  *   - object keys and array indices are dot-joined into the path,
  *     rooted at the caller-supplied root ("item" / "context").
  *
  * Insertion order is document order (LinkedHashMap), matching Python
  * dict semantics, though consumers treat the result as unordered.
  */
object JsonFlattener {

  def flatten(json: String, root: String): mutable.LinkedHashMap[String, FlatValue] = {
    val out = mutable.LinkedHashMap.empty[String, FlatValue]
    CanonicalJson.tryParse(json).foreach(node => flattenInto(node, root, out))
    out
  }

  def flattenInto(node: JsonNode, path: String,
      out: mutable.LinkedHashMap[String, FlatValue]): Unit = {
    if (node == null || node.isNull) ()
    else if (node.isBoolean) out(path) = FlatValue.Num(if (node.booleanValue()) 1.0 else 0.0)
    else if (node.isNumber) out(path) = FlatValue.Num(node.doubleValue())
    else if (node.isTextual) out(path) = FlatValue.Str(node.textValue())
    else if (node.isObject) {
      node.properties().asScala.foreach { e =>
        flattenInto(e.getValue, path + "." + e.getKey, out)
      }
    } else if (node.isArray) {
      var i = 0
      val it = node.elements()
      while (it.hasNext) {
        flattenInto(it.next(), path + "." + i, out)
        i += 1
      }
    } else if (node.isMissingNode) {
      // readTree("") returns MissingNode (no exception) — an empty or
      // whitespace-only payload flattens to no features, it must not
      // abort the job
    } else throw new IllegalArgumentException(s"invalid node ${node.getNodeType}")
  }

  /** Flatten an (item, context) pair into one feature map, roots per
    * the reference's constants (`item`, `context`).
    */
  def flattenRecord(itemJson: String, contextJson: String): Map[String, FlatValue] = {
    val out = mutable.LinkedHashMap.empty[String, FlatValue]
    if (itemJson != null)
      CanonicalJson.tryParse(itemJson).foreach(flattenInto(_, "item", out))
    if (contextJson != null)
      CanonicalJson.tryParse(contextJson).foreach(flattenInto(_, "context", out))
    out.toMap
  }
}
