package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CanonicalJsonSpec extends AnyFunSuite {

  test("sorts object keys recursively, compact output") {
    val s = """{"b": 1, "a": {"z": true, "y": [3, {"q": null, "p": "x"}]}}"""
    assert(CanonicalJson.canonicalize(s) ==
      """{"a":{"y":[3,{"p":"x","q":null}],"z":true},"b":1}""")
  }

  test("preserves integers and renders integral doubles with .0") {
    assert(CanonicalJson.canonicalize("""{"i": 5, "f": 5.0, "g": 2.5}""") ==
      """{"f":5.0,"g":2.5,"i":5}""")
    assert(CanonicalJson.canonicalize("[9007199254740993]") == "[9007199254740993]")
  }

  test("escapes control characters and quotes") {
    assert(CanonicalJson.dumps(CanonicalJson.parse("\"a\\nb\\\"c\\u0001\"")) ==
      "\"a\\nb\\\"c\\u0001\"")
  }

  test("wrapping primitive: null → {}, primitive → {\"$value\": p}, containers as-is") {
    assert(CanonicalJson.dumpsWrappingPrimitive(CanonicalJson.parse("null")) == "{}")
    assert(CanonicalJson.dumpsWrappingPrimitive(null) == "{}")
    assert(CanonicalJson.dumpsWrappingPrimitive(CanonicalJson.parse("3")) == """{"$value":3}""")
    assert(CanonicalJson.dumpsWrappingPrimitive(CanonicalJson.parse("\"hi\"")) == """{"$value":"hi"}""")
    assert(CanonicalJson.dumpsWrappingPrimitive(CanonicalJson.parse("true")) == """{"$value":true}""")
    assert(CanonicalJson.dumpsWrappingPrimitive(CanonicalJson.parse("""{"b":2,"a":1}""")) == """{"a":1,"b":2}""")
    assert(CanonicalJson.dumpsWrappingPrimitive(CanonicalJson.parse("[1,2]")) == "[1,2]")
  }

  test("keys sort by code point, not UTF-16 units; -0.0 keeps its sign") {
    // U+1F600 (surrogate pair, high unit 0xD83D) must sort AFTER U+E000
    val s = "{\"😀\": 1, \"\": 2}"
    assert(CanonicalJson.canonicalize(s) == "{\"\":2,\"😀\":1}")
    assert(CanonicalJson.canonicalize("""{"a": -0.0}""") == """{"a":-0.0}""")
  }

  test("double rendering matches orjson/Python repr across ranges") {
    // expected strings are python repr(v) outputs (orjson float text)
    val cases = Seq(
      1e-7 -> "1e-07", 1.5e-5 -> "1.5e-05", 0.0001 -> "0.0001",
      0.00001 -> "1e-05", 1e15 -> "1000000000000000.0", 1e16 -> "1e+16",
      1.5e16 -> "1.5e+16", 123.456 -> "123.456", 0.001 -> "0.001",
      2.5 -> "2.5", -1e-7 -> "-1e-07",
      // NOT covered: values where the pre-Ryū JDK 17 Double.toString
      // emits non-shortest digits (e.g. 1e23 → "9.999999999999999E22",
      // 5e-324 → "4.9E-324") — the formatter reuses Java's digits, a
      // documented deviation from orjson's shortest-round-trip output
      1.7976931348623157e308 -> "1.7976931348623157e+308")
    cases.foreach { case (v, expect) =>
      assert(CanonicalJson.formatDouble(v) == expect, s"for $v")
    }
    // and through the full serializer
    assert(CanonicalJson.canonicalize("""{"a": 1e-7, "b": 2e16}""") ==
      """{"a":1e-07,"b":2e+16}""")
  }

  test("tryParse returns None on invalid json") {
    assert(CanonicalJson.tryParse("{not json").isEmpty)
    assert(CanonicalJson.tryParse("""{"a":1}""").isDefined)
  }
}
