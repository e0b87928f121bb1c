package graft.train

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Ksuid
import graft.schema.RewardedDecisionRow
import graft.train.Trainer.TrainConfig

/** Serving-path regression cover: the score/rank census under a FIXED
  * seed and fixed synthetic data. Model floats are not DuckDB-oracle
  * material, but with every stochastic choice pinned to the seed the
  * ranked output is deterministic — so the spec pins a fingerprint of
  * the rounded ranked census and round-over-round drift anywhere in
  * flatten → encode → transform → de-normalize → rank fails it.
  */
class ScorerSpec extends AnyFunSuite with SparkTestBase {

  private val cfg = TrainConfig(
    maxFeatures = 50, pruneMinStringCount = 0, maxTrees = 5,
    propensityTrees = 5, treeDepth = 3, explore = true, seed = 7L)

  /** Same bandit shape as TrainerSpec: "a" frequent and rewarded ~2.5,
    * "b" middling 0.5, "c" rare and never rewarded.
    */
  private def trainedModel(): Trainer.DecisionModel = {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val base = 1660000000L
    val rows = (0 until 300).map { i =>
      val r = rnd.nextDouble()
      val (item, sample, reward) =
        if (r < 0.6) ("\"a\"", "\"b\"", 2.0 + rnd.nextDouble())
        else if (r < 0.9) ("\"b\"", "\"c\"", 0.5)
        else ("\"c\"", "\"a\"", 0.0)
      RewardedDecisionRow(
        Ksuid.deterministic(base + i, i.toLong),
        Some(item), Some(s"""{"device":"d${i % 3}"}"""), Some(3.0), Some(sample),
        Some("{}"), Some(reward), "m")
    }
    val df = rows.toDF().persist()
    try Trainer.trainDecision(df, Trainer.trainPropensity(df, cfg), cfg)
    finally { df.unpersist(); () }
  }

  test("rank: deterministic census — count, bounds, order, pinned fingerprint") {
    val dm = trainedModel()
    val candidates = Seq("\"a\"", "\"b\"", "\"c\"", """{"k":1}""", """{"k":2}""")
    val context = """{"device":"d1"}"""
    val ranked = Scorer.rank(spark, dm, candidates, context)

    // every candidate scored exactly once
    assert(ranked.map(_._1).sorted == candidates.sorted)
    // learned signal survives the serving path end to end
    assert(ranked.indexWhere(_._1 == "\"a\"") < ranked.indexWhere(_._1 == "\"c\""),
      ranked.toString)
    // de-normalized bounds: GBT leaves average the (normalized) training
    // targets, so reward-unit scores stay inside the observed reward
    // range [0, 3]
    assert(ranked.forall { case (_, s) => s >= -1e-6 && s <= 3.0 + 1e-6 },
      ranked.toString)
    // bit-deterministic on re-invocation (content-hash stochastics,
    // broadcast model — nothing schedule-dependent)
    assert(Scorer.rank(spark, dm, candidates, context) == ranked)
    // round-over-round fingerprint (3-decimal census): catches silent
    // serving-path drift between rounds; re-pin only for a DELIBERATE
    // change to training/encoding semantics
    val fp = ranked.map { case (it, s) => s"$it=${math.rint(s * 1000) / 1000}" }
      .mkString("|")
    assert(fp == "\"a\"=1.439|\"b\"=0.273|\"c\"=0.273|{\"k\":1}=0.273|{\"k\":2}=0.273",
      s"serving-path census drifted: $fp")
  }

  test("score: row count and caller columns pass through untouched") {
    import spark.implicits._
    val dm = trainedModel()
    val df = Seq(("\"a\"", 1), ("\"b\"", 2), ("\"c\"", 3))
      .toDF("item", "tag")
      .withColumn("context", lit("""{"device":"d0"}"""))
    val out = Scorer.score(df, dm)
    assert(out.count() == 3)
    assert(out.columns.toSet == Set("item", "tag", "context", "score"))
    assert(out.select("tag").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }
}
