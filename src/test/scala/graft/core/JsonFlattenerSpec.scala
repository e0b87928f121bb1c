package graft.core

import org.scalatest.funsuite.AnyFunSuite
import FlatValue._

class JsonFlattenerSpec extends AnyFunSuite {

  test("dot paths for nested objects and arrays, rooted") {
    val m = JsonFlattener.flatten("""{"a":{"b":1},"c":["x","y"]}""", "item")
    assert(m.toMap == Map(
      "item.a.b" -> Num(1.0),
      "item.c.0" -> Str("x"),
      "item.c.1" -> Str("y")))
  }

  test("null, {} and [] are dropped as missing") {
    val m = JsonFlattener.flatten("""{"a":null,"b":{},"c":[],"d":0}""", "item")
    assert(m.toMap == Map("item.d" -> Num(0.0)))
    assert(JsonFlattener.flatten("null", "item").isEmpty)
  }

  test("booleans become 1.0/0.0, numbers stay numbers, strings stay strings") {
    val m = JsonFlattener.flatten("""{"t":true,"f":false,"n":2.5,"s":"v"}""", "context")
    assert(m.toMap == Map(
      "context.t" -> Num(1.0),
      "context.f" -> Num(0.0),
      "context.n" -> Num(2.5),
      "context.s" -> Str("v")))
  }

  test("bare primitives land at the root path") {
    assert(JsonFlattener.flatten("7", "item").toMap == Map("item" -> Num(7.0)))
    assert(JsonFlattener.flatten("\"hello\"", "item").toMap == Map("item" -> Str("hello")))
  }

  test("flattenRecord merges item and context under their roots") {
    val m = JsonFlattener.flattenRecord("""{"x":1}""", """{"y":"v"}""")
    assert(m == Map("item.x" -> Num(1.0), "context.y" -> Str("v")))
    assert(JsonFlattener.flattenRecord(null, """{"y":2}""") == Map("context.y" -> Num(2.0)))
  }
}
