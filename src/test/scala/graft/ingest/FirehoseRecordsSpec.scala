package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Ksuid

class FirehoseRecordsSpec extends AnyFunSuite {

  private val now = 1700000000L
  private def id(offsetSec: Long, seed: Long) = Ksuid.deterministic(now - offsetSec, seed)

  private val did = id(3600, 1)
  private val mid = id(1800, 2)

  private def parse(line: String) = FirehoseRecords.parseLine(line, now)

  test("decision record projects to a keyed row with canonical payloads") {
    val r = parse(
      s"""{"message_id":"$did","model":"m1","count":3,"item":{"b":1,"a":2},"context":{}}""").row.get
    assert(r.decision_id == did)
    assert(r.item.contains("""{"a":2,"b":1}"""))
    assert(r.context.contains("{}"))
    assert(r.count.contains(3.0))
    assert(r.sample.isEmpty) // absent sample stays absent
    assert(r.rewards.isEmpty && r.reward.isEmpty)
    assert(r.model == "m1")
  }

  test("absent item/context encode as the JSON string \"null\"; tracked-null sample is \"null\"") {
    val r = parse(s"""{"message_id":"$did","model":"m","count":2,"sample":null}""").row.get
    assert(r.item.contains("null"))
    assert(r.context.contains("null"))
    assert(r.sample.contains("null")) // present-and-null ≠ absent
  }

  test("reward record projects to a partial row with a singleton rewards map") {
    val r = parse(s"""{"message_id":"$mid","model":"m","decision_id":"$did","reward":2.5}""").row.get
    assert(r.decision_id == did)
    assert(r.rewards.contains(s"""{"$mid":2.5}"""))
    assert(r.reward.isEmpty) // reward column is only set by merge
    assert(r.item.isEmpty && r.count.isEmpty)
  }

  test("integral rewards stay integral in the map") {
    val r = parse(s"""{"message_id":"$mid","model":"m","decision_id":"$did","reward":100}""").row.get
    assert(r.rewards.contains(s"""{"$mid":100}"""))
  }

  test("validation failures") {
    assert(parse("not json").error.contains("invalid json"))
    assert(parse("[1,2]").error.contains("not a json object"))
    assert(parse(s"""{"model":"m","count":1}""").error.contains("missing message_id"))
    assert(parse(s"""{"message_id":"tooshort","model":"m","count":1}""").error.contains("invalid message_id"))
    assert(parse(s"""{"message_id":"$did","model":"-bad","count":1}""").error.contains("invalid model"))
    assert(parse(s"""{"message_id":"$did","model":"m","count":0}""").error.contains("invalid count"))
    assert(parse(s"""{"message_id":"$did","model":"m","count":2.5}""").error.contains("invalid count"))
    assert(parse(s"""{"message_id":"$did","model":"m","count":1,"sample":null}""")
      .error.contains("invalid count of 1 with sample"))
    assert(parse(s"""{"message_id":"$did","model":"m"}""").error.contains("missing decision_id"))
    assert(parse(s"""{"message_id":"$did","model":"m","decision_id":"$mid"}""").error.contains("invalid reward"))
    assert(parse(s"""{"message_id":"$did","model":"m","decision_id":"$mid","reward":"x"}""")
      .error.contains("invalid reward"))
  }

  test("future ksuids are rejected") {
    val future = Ksuid.deterministic(now + 3600, 9)
    assert(parse(s"""{"message_id":"$future","model":"m","count":2}""")
      .error.contains("invalid message_id"))
    assert(parse(s"""{"message_id":"$mid","model":"m","decision_id":"$future","reward":1}""")
      .error.contains("invalid decision_id"))
  }

  test("count 1 without sample is a valid decision") {
    val r = parse(s"""{"message_id":"$did","model":"m","count":1,"item":"a"}""").row.get
    assert(r.count.contains(1.0))
    assert(r.item.contains("\"a\""))
  }
}
