package graft.functions

import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Ksuid
import graft.schema.PartitionFilename

class KsuidExpressionsSpec extends AnyFunSuite with SparkTestBase {

  private val rnd = new scala.util.Random(13)

  private def randomId(): (Long, String) = {
    val ts = Ksuid.Epoch + math.abs(rnd.nextLong() % 0xffffffffL)
    val payload = new Array[Byte](16)
    rnd.nextBytes(payload)
    (ts, Ksuid.encode(ts, payload))
  }

  test("timestampSecondsFast equals the BigInteger decode on valid and invalid inputs") {
    for (_ <- 1 to 500) {
      val (ts, id) = randomId()
      assert(Ksuid.timestampSecondsFast(id.getBytes("UTF-8")) == ts)
      assert(Ksuid.timestampSeconds(id).contains(ts))
    }
    val invalid = Seq(
      "", "short", "x" * 27, "!" * 27, "héllo" + "0" * 22,
      "z" * 27, // ≥ 2^160 — decodeBytes rejects it too
      "0" * 26 + "!", null)
    invalid.foreach { s =>
      val bytes = if (s == null) null else s.getBytes("UTF-8")
      assert(Ksuid.timestampSecondsFast(bytes) == -1L, s"should reject $s")
      if (s != null) assert(Ksuid.timestampSeconds(s).isEmpty, s)
    }
    // boundary: the minimum (all-zero) and maximum canonical KSUIDs
    assert(Ksuid.timestampSecondsFast(("0" * 27).getBytes) == Ksuid.Epoch)
    val maxId = Ksuid.encode(Ksuid.Epoch + 0xffffffffL, Array.fill[Byte](16)(-1))
    assert(Ksuid.timestampSecondsFast(maxId.getBytes) == Ksuid.Epoch + 0xffffffffL)
  }

  test("basicIsoUtc is bit-identical to the DateTimeFormatter rendering") {
    val fmt = DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)
    val boundaries = Seq(
      Ksuid.Epoch, Ksuid.Epoch + 0xffffffffL,
      1661990399L, 1661990400L, // month boundary
      1582934400L,              // leap-year Feb 29
      1704067199L, 1704067200L) // year boundary
    val samples = boundaries ++ (1 to 2000).map(_ =>
      Ksuid.Epoch + math.abs(rnd.nextLong() % 0xffffffffL))
    samples.foreach { ts =>
      assert(Ksuid.basicIsoUtc(ts) == fmt.format(java.time.Instant.ofEpochSecond(ts)), s"ts=$ts")
    }
  }

  test("DataFrame expressions match timestampOf / timestampSeconds and stay in codegen") {
    import spark.implicits._
    val ids = (1 to 100).map(_ => randomId()._2)
    val df = ids.toDF("id").repartition(2)
    val out = df.select(
        col("id"),
        KsuidExpressions.ksuidTimestamp(col("id")).as("ts"),
        KsuidExpressions.ksuidBasicIso(col("id")).as("iso"))
    out.collect().foreach { r =>
      val id = r.getString(0)
      assert(r.getLong(1) == Ksuid.timestampSeconds(id).get)
      assert(r.getString(2) == PartitionFilename.timestampOf(id))
    }
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [id"), plan)
    assert(!plan.contains("UDF"), plan)
  }

  test("invalid ids: ksuid_timestamp yields null, ksuid_basic_iso throws") {
    import spark.implicits._
    val df = Seq("not-a-ksuid").toDF("id").repartition(1)
    val ts = df.select(KsuidExpressions.ksuidTimestamp(col("id"))).collect()(0)
    assert(ts.isNullAt(0))
    val e = intercept[Exception] {
      df.select(KsuidExpressions.ksuidBasicIso(col("id"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("ksuidDeterministic matches Ksuid.deterministic through the column path") {
    import spark.implicits._
    val rows = Seq((1700000000L, 7L), (1700000001L, 7L), (1700000000L, 8L),
      (1500000000L, 0L)) // 0 is invalid: epochs below the KSUID epoch throw in encode
    val out = rows.toDF("ts", "seed").repartition(2)
      .select(col("ts"), col("seed"),
        KsuidExpressions.ksuidDeterministic(col("ts"), col("seed")).as("id"))
      .as[(Long, Long, String)].collect()
    out.foreach { case (ts, seed, id) =>
      assert(id == graft.core.Ksuid.deterministic(ts, seed), s"($ts,$seed)")
    }
    // deterministic ids round-trip their timestamp
    out.foreach { case (ts, _, id) =>
      assert(graft.core.Ksuid.timestampSecondsFast(id.getBytes) == ts)
    }
  }

  test("SQL surface: ksuid_timestamp / ksuid_basic_iso / flatten_features registered") {
    Functions.register(spark)
    val (ts, id) = randomId()
    val r = spark.sql(
      s"""SELECT ksuid_timestamp('$id') AS ts,
         |       ksuid_basic_iso('$id') AS iso,
         |       flatten_features('{"a":1}', '{"b":"x"}') AS f""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == ts)
    assert(r.getString(1) == PartitionFilename.timestampOf(id))
    val f = r.getStruct(2)
    assert(f.getMap[String, Double](0).toMap == Map("item.a" -> 1.0))
    assert(f.getMap[String, String](1).toMap == Map("context.b" -> "x"))
  }
}
