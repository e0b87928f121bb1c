package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.time.{LocalDateTime, ZoneOffset}
import java.util.Base64

/** KSUID codec against the reference's golden corpus
  * (/root/reference/tests/tracker/ksuid.json: timestamp + 16-byte
  * payload → expected base62), plus validity and ordering properties.
  */
class KsuidSpec extends AnyFunSuite {

  private val corpusPath = "/root/reference/tests/tracker/ksuid.json"

  private def corpus: Seq[(Long, Array[Byte], String)] = {
    val text = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(corpusPath)))
    val arr = CanonicalJson.parse(text)
    (0 until arr.size()).map { i =>
      val o = arr.get(i)
      // corpus mixes '...', '...Z' and '...+00:00' forms, all UTC; its
      // boundary cases record the UNCLAMPED display time but a ksuid
      // clamped into [epoch, epoch + 2^32 - 1] (generate_ksuid_json_data.py)
      val raw = o.get("timestamp").textValue()
        .stripSuffix("Z").stripSuffix("+00:00")
      val parsed = LocalDateTime.parse(raw).toEpochSecond(ZoneOffset.UTC)
      val ts = math.min(math.max(parsed, Ksuid.Epoch), Ksuid.Epoch + 0xffffffffL)
      val payload = Base64.getDecoder.decode(o.get("uid_base64").textValue())
      (ts, payload, o.get("ksuid_base62").textValue())
    }
  }

  test("encodes the reference golden corpus bit-exactly") {
    assume(new java.io.File(corpusPath).exists())
    corpus.foreach { case (ts, payload, expected) =>
      assert(Ksuid.encode(ts, payload) == expected)
    }
  }

  test("decodes timestamp from the golden corpus") {
    assume(new java.io.File(corpusPath).exists())
    corpus.foreach { case (ts, _, base62) =>
      assert(Ksuid.timestampSeconds(base62).contains(ts))
    }
  }

  test("round-trips encode/decode") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val ts = Ksuid.Epoch + math.abs(rnd.nextLong() % 0xffffffffL)
      val payload = new Array[Byte](16)
      rnd.nextBytes(payload)
      val s = Ksuid.encode(ts, payload)
      assert(s.length == 27)
      val bytes = Ksuid.decodeBytes(s).get
      assert(Ksuid.timestampSeconds(bytes) == ts)
      assert(bytes.drop(4).sameElements(payload))
    }
  }

  test("lexicographic order equals chronological order") {
    val rnd = new scala.util.Random(11)
    val ids = (1 to 500).map { _ =>
      val ts = Ksuid.Epoch + math.abs(rnd.nextInt(1000000000)).toLong
      val payload = new Array[Byte](16)
      rnd.nextBytes(payload)
      (ts, Ksuid.encode(ts, payload))
    }
    val bySorted = ids.sortBy(_._2).map(_._1)
    assert(bySorted == bySorted.sorted)
  }

  test("rejects malformed ids") {
    assert(Ksuid.decodeBytes(null).isEmpty)
    assert(Ksuid.decodeBytes("").isEmpty)
    assert(Ksuid.decodeBytes("short").isEmpty)
    assert(Ksuid.decodeBytes("!" * 27).isEmpty)
    assert(Ksuid.decodeBytes("z" * 27).isEmpty) // > 2^160
  }

  test("rejects ids from the future") {
    val now = 1700000000L
    val past = Ksuid.deterministic(now - 60, 1)
    val future = Ksuid.deterministic(now + 3600, 2)
    assert(Ksuid.isValid(past, now))
    assert(!Ksuid.isValid(future, now))
  }
}
