package graft.schema

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CanonicalJson

/** Key-validity filtering against the reference's listing fixtures
  * (tests/test_cases/tracker_test_cases/list_partition_s3_keys_*.json):
  * keys surviving our regexp must equal the fixture's expected set.
  */
class PartitionFilenameSpec extends AnyFunSuite {

  private val casesDir = "/root/reference/tests/test_cases/tracker_test_cases"

  private def loadCase(name: String) = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$casesDir/$name.json")))
    CanonicalJson.parse(text)
  }

  for (name <- Seq(
      "list_partition_s3_keys_all_valid_keys",
      "list_partition_s3_keys_valid_and_invalid_keys",
      "list_partition_s3_keys_all_invalid_keys")) {
    test(s"listing fixture: $name") {
      assume(new java.io.File(s"$casesDir/$name.json").exists())
      val tc = loadCase(name)
      val keys = {
        val arr = tc.get("test_case").get("s3_keys")
        (0 until arr.size()).map(arr.get(_).textValue())
      }
      val expected = {
        val arr = tc.get("expected_s3_keys")
        (0 until arr.size()).map(arr.get(_).textValue()).toSet
      }
      assert(keys.filter(PartitionFilename.isValidKey).toSet == expected)
    }
  }

  test("filename codec round-trips and orders lexicographically by max time") {
    val k1 = PartitionFilename.key("m", graft.core.Ksuid.deterministic(1660000000L, 1),
      graft.core.Ksuid.deterministic(1660003600L, 2), 500)
    assert(PartitionFilename.isValidKey(k1))
    val parsed = PartitionFilename.parse(k1.split('/').last).get
    assert(parsed.rowCount == 500)
    assert(parsed.minTs < parsed.maxTs)
    assert(k1.contains(s"/${parsed.maxTs.take(4)}/"))
  }
}
