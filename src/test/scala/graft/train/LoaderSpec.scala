package graft.train

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Ksuid
import graft.ingest.PartitionStore
import graft.schema.RewardedDecisionRow

class LoaderSpec extends AnyFunSuite with SparkTestBase {

  private def key(maxTs: String, minTs: String, rows: Int) =
    s"rewarded_decisions/m/parquet/2023/07/05/$maxTs-$minTs-$rows-" +
      "00000000-0000-0000-0000-000000000000.parquet"

  test("newest-first early stop at maxRows") {
    val keys = (0 until 10).map(i =>
      key(f"20230705T00002${i}Z", f"20230705T00001${i}Z", 1000))
    val sel = Loader.selectFiles(keys, maxRows = 2500, minRows = 0, sample = 1.0, seed = 1)
    // newest 3 files reach 3000 ≥ 2500; row-sample trims to ~2500
    assert(sel.keys == keys.reverse.take(3))
    assert(sel.listedRows == 3000)
    assert(math.abs(sel.rowSampleFraction - 2500.0 / 3000) < 1e-9)
  }

  test("minRows overrides an aggressive sample") {
    val keys = (0 until 5).map(i =>
      key(f"20230705T00002${i}Z", f"20230705T00001${i}Z", 100))
    // sample 0.632 of 500 rows < minRows 500 → effective sample raised to 1.0
    val sel = Loader.selectFiles(keys, maxRows = 500, minRows = 500, sample = 0.632, seed = 1)
    assert(sel.keys.length == 5)
    assert(sel.rowSampleFraction == 1.0)
  }

  test("sample applies row-wise even when the data fits under maxRows") {
    val keys = (0 until 4).map(i =>
      key(f"20230705T00002${i}Z", f"20230705T00001${i}Z", 1000))
    val sel = Loader.selectFiles(keys, maxRows = 1000000, minRows = 0, sample = 0.5, seed = 1)
    assert(sel.rowSampleFraction == 0.5)
  }

  test("file-level sampling does NOT re-apply the sample row-wise") {
    // >100 files, >1M listed rows, sample < 1 → file sampling kicks in;
    // composing both levels would load at sample² and break the explore
    // bootstrap's survival-rate contract (weights assume 1−1/e ONCE)
    val keys = (0 until 200).map(i =>
      key(f"20230705T${i}%06dZ", f"20230704T${i}%06dZ", 10000))
    val sel = Loader.selectFiles(keys, maxRows = 2000000, minRows = 0,
      sample = 0.632, seed = 1)
    assert(sel.keys.length < 200, "file sampling should have dropped files")
    // rows are only trimmed to the maxRows cap afterwards — never
    // multiplied by the sample again
    val cap = math.min(1.0, 2000000.0 / sel.listedRows)
    assert(math.abs(sel.rowSampleFraction - cap) < 1e-9,
      s"rowFraction ${sel.rowSampleFraction} must equal cap $cap, not cap·sample")
  }

  test("corrupt partition files are skipped, not fatal") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("loader").toString
    val rows = (0 until 100).map { i =>
      RewardedDecisionRow(Ksuid.deterministic(1660000000L + i, i.toLong),
        Some("{}"), Some("{}"), Some(2.0), None, Some("{}"), Some(0.0), "m")
    }
    PartitionStore.write(rows.toDF(), dir, "m")
    // corrupt a file in place
    val keys = PartitionStore.listKeys(spark, dir, "m")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/${keys.head}"), "not parquet at all")
    val loaded = Loader.load(spark, dir, "m", maxRows = 1000)
    assert(loaded.count() >= 0) // no exception; corrupt file contributes nothing
  }
}
