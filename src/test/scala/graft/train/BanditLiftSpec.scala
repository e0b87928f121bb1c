package graft.train

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.core.Ksuid
import graft.ingest.{Merge, PartitionStore}
import graft.schema.Schema
import graft.train.Trainer.TrainConfig

/** Bandit-lift gate: proves the trained model LEARNS, not just trains
  * (the analogue of the reference's regret benchmark — its
  * `FeatureMatcher`-style environments reward choosing the item that
  * matches the context; reference:
  * src/trainer/benchmark/benchmark.py:53-73).
  *
  * A seeded synthetic environment plants reward structure
  * (best item depends on context), a UNIFORM logging policy generates
  * firehose decision+reward records, the FULL chain runs
  * (JSONL ingest → merge → partition store → listing-driven load →
  * two-phase train), and the fitted scorer must rank each context's
  * planted-best item first — realizing materially more reward than
  * the uniform-random baseline.
  */
class BanditLiftSpec extends AnyFunSuite with SparkTestBase {

  private val nContexts = 3
  private val nItems = 5
  // planted structure: best item for context c is (2c + 1) mod nItems
  private def bestItem(c: Int): Int = (2 * c + 1) % nItems
  private def reward(item: Int, c: Int): Double =
    if (item == bestItem(c)) 1.0 else 0.0

  test("full-chain trained scorer beats the uniform-random policy on planted rewards") {
    val rnd = new scala.util.Random(12345)
    val base = 1660000000L
    val n = 2500

    // uniform logging policy: every (context, item) pair gets coverage
    val lines = (0 until n).flatMap { i =>
      val c = rnd.nextInt(nContexts)
      val item = rnd.nextInt(nItems)
      val sample = (item + 1 + rnd.nextInt(nItems - 1)) % nItems // any OTHER item
      val did = Ksuid.deterministic(base + i, i.toLong)
      val decision =
        s"""{"message_id":"$did","model":"bandit","count":$nItems,""" +
          s""""item":"i$item","context":{"c":"c$c"},"sample":"i$sample"}"""
      val r = reward(item, c)
      if (r > 0) {
        val rid = Ksuid.deterministic(base + i, i.toLong + 2000000000L)
        Seq(decision,
          s"""{"message_id":"$rid","model":"bandit","decision_id":"$did","reward":$r}""")
      } else Seq(decision)
    }

    val work = java.nio.file.Files.createTempDirectory("bandit_lift").toString
    val fh = s"$work/firehose.jsonl"
    java.nio.file.Files.write(java.nio.file.Paths.get(fh),
      lines.mkString("\n").getBytes("UTF-8"))

    // full chain: ingest → merge → store → load → two-phase train
    val merged = Merge.ingest(spark, Seq(fh))
    PartitionStore.write(merged, s"$work/store", "bandit")
    val cfg = TrainConfig(
      maxFeatures = 20, pruneMinStringCount = 0, maxTrees = 60,
      propensityTrees = 10, treeDepth = 4, explore = true, seed = 9L)
    val sample = graft.encoding.Encoding.NonZeroPoissonProbability
    val loaded = Loader.load(spark, s"$work/store", "bandit",
        maxRows = 1000000L, minRows = 1000000L, sample = sample, seed = cfg.seed)
      .withColumn(Schema.Model, org.apache.spark.sql.functions.lit("bandit"))
      .persist()
    val pm = Trainer.trainPropensity(loaded, cfg)
    val dm = Trainer.trainDecision(loaded, pm, cfg)
    loaded.unpersist()

    // evaluate: expected planted reward of the scorer's top-1 choice
    // per context vs the uniform-random policy (1/nItems per context)
    val items = (0 until nItems).map(i => s""""i$i"""")
    val scorerReward = (0 until nContexts).map { c =>
      val ranked = Scorer.rank(spark, dm, items, s"""{"c":"c$c"}""")
      val top = ranked.head._1.stripPrefix("\"").stripSuffix("\"").drop(1).toInt
      reward(top, c)
    }.sum / nContexts
    val randomReward = 1.0 / nItems // uniform over items, any context

    assert(scorerReward == 1.0,
      s"scorer failed to rank the planted-best item first in every context " +
        s"(realized $scorerReward)")
    assert(scorerReward > randomReward * 3,
      s"lift over random too small: $scorerReward vs $randomReward")
  }
}
