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

  /** One full chain (ingest → merge → store → load → two-phase train),
    * shared by the lift gate and the regret benchmark below.
    */
  private lazy val dm: Trainer.DecisionModel = {
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
    val out = Trainer.trainDecision(loaded, pm, cfg)
    loaded.unpersist()
    out
  }

  /** The scorer's top-1 item per context (greedy offline policy). */
  private lazy val scorerChoice: Map[Int, Int] = {
    val items = (0 until nItems).map(i => s""""i$i"""")
    (0 until nContexts).map { c =>
      val ranked = Scorer.rank(spark, dm, items, s"""{"c":"c$c"}""")
      c -> ranked.head._1.stripPrefix("\"").stripSuffix("\"").drop(1).toInt
    }.toMap
  }

  test("full-chain trained scorer beats the uniform-random policy on planted rewards") {
    // evaluate: expected planted reward of the scorer's top-1 choice
    // per context vs the uniform-random policy (1/nItems per context)
    val scorerReward =
      (0 until nContexts).map(c => reward(scorerChoice(c), c)).sum / nContexts
    val randomReward = 1.0 / nItems // uniform over items, any context

    assert(scorerReward == 1.0,
      s"scorer failed to rank the planted-best item first in every context " +
        s"(realized $scorerReward)")
    assert(scorerReward > randomReward * 3,
      s"lift over random too small: $scorerReward vs $randomReward")
  }

  test("regret benchmark: trained scorer's regret <= Thompson, UCB, epsilon-greedy, random") {
    // the reference's benchmark pits the learner against classic online
    // baselines on the same environment (benchmark.py:53-73:
    // ThompsonSampling / UCBSampling / EpsilonGreedy / RandomSampling);
    // regret = Σ (best-arm reward − realized reward) over T rounds of
    // uniformly drawn contexts. The baselines learn ONLINE (they update
    // on every pull); the trained scorer is the engine's OFFLINE
    // product — it must still match or beat them on its training
    // environment.
    val T = 2000
    val envRnd = new scala.util.Random(777)
    val contexts = Array.fill(T)(envRnd.nextInt(nContexts))

    final class Arms { // per-(context, item) pull statistics
      val pulls = Array.fill(nContexts, nItems)(0)
      val wins = Array.fill(nContexts, nItems)(0.0)
      def update(c: Int, i: Int, r: Double): Unit = { pulls(c)(i) += 1; wins(c)(i) += r }
      def mean(c: Int, i: Int): Double =
        if (pulls(c)(i) == 0) 0.0 else wins(c)(i) / pulls(c)(i)
    }

    def run(seed: Long)(choose: (Arms, Int, Int, scala.util.Random) => Int): Double = {
      val rnd = new scala.util.Random(seed)
      val arms = new Arms
      var regret = 0.0
      var t = 0
      while (t < T) {
        val c = contexts(t)
        val i = choose(arms, c, t, rnd)
        val r = reward(i, c)
        arms.update(c, i, r)
        regret += 1.0 - r // planted best always pays 1
        t += 1
      }
      regret
    }

    val randomRegret = run(1L)((_, _, _, rnd) => rnd.nextInt(nItems))

    val epsilonRegret = run(2L) { (arms, c, _, rnd) =>
      if (rnd.nextDouble() < 0.1) rnd.nextInt(nItems)
      else (0 until nItems).maxBy(arms.mean(c, _))
    }

    val ucbRegret = run(3L) { (arms, c, t, _) =>
      (0 until nItems).maxBy { i =>
        if (arms.pulls(c)(i) == 0) Double.MaxValue
        else arms.mean(c, i) + math.sqrt(2 * math.log(t + 1.0) / arms.pulls(c)(i))
      }
    }

    val thompsonRegret = run(4L) { (arms, c, _, rnd) =>
      (0 until nItems).maxBy { i => // Beta(1+wins, 1+losses) via two Gammas
        val a = 1.0 + arms.wins(c)(i)
        val b = 1.0 + arms.pulls(c)(i) - arms.wins(c)(i)
        def gamma(shape: Double): Double = { // Marsaglia–Tsang, shape >= 1
          val d = shape - 1.0 / 3
          val cc = 1.0 / math.sqrt(9 * d)
          var out = -1.0
          while (out < 0) {
            val x = rnd.nextGaussian()
            val v = math.pow(1 + cc * x, 3)
            if (v > 0 && math.log(rnd.nextDouble()) < 0.5 * x * x + d - d * v + d * math.log(v))
              out = d * v
          }
          out
        }
        val g1 = gamma(a); val g2 = gamma(b)
        g1 / (g1 + g2)
      }
    }

    val trainedRegret = run(5L)((_, c, _, _) => scorerChoice(c))

    assert(trainedRegret == 0.0, s"trained scorer incurred regret $trainedRegret")
    assert(trainedRegret <= thompsonRegret,
      s"trained $trainedRegret > thompson $thompsonRegret")
    assert(trainedRegret <= ucbRegret, s"trained $trainedRegret > ucb $ucbRegret")
    assert(trainedRegret <= epsilonRegret,
      s"trained $trainedRegret > epsilon $epsilonRegret")
    // sanity of the harness itself: every online learner beats random
    assert(thompsonRegret < randomRegret && ucbRegret < randomRegret &&
      epsilonRegret < randomRegret,
      s"baselines vs random: ts=$thompsonRegret ucb=$ucbRegret " +
        s"eps=$epsilonRegret rand=$randomRegret")
  }
}
