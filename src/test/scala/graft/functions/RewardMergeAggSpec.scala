package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BoundReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.GraftColumn
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase
import graft.ingest.Merge

/** The mergeable rewards-map aggregate must be BIT-identical to the
  * fold it replaced: sort_array(collect_list(struct(src, seq, maps)))
  * → Merge.mergeRewardMaps, whose reward sum is float-summation-order
  * sensitive (keys sum in first-insertion order of the ascending
  * fold). The reference fold here IS that old implementation, run
  * locally.
  */
class RewardMergeAggSpec extends AnyFunSuite with SparkTestBase {

  /** The pre-aggregate implementation, verbatim semantics: ascending
    * (src, seq, UTF8-byte-wise map) sort, then the sequential fold.
    */
  private def oldFold(rows: Seq[(Long, Long, String)]): (String, Double) =
    oldFoldOpt(rows.map { case (s, q, m) => (Some(s): Option[Long], Some(q): Option[Long], m) })

  private def oldFoldOpt(rows: Seq[(Option[Long], Option[Long], String)]): (String, Double) = {
    val sorted = rows
      .filter(_._3 != null)
      .sortWith { case ((as, aq, am), (bs, bq, bm)) =>
        RewardMergeAgg.compare(
          as.map(java.lang.Long.valueOf).orNull,
          aq.map(java.lang.Long.valueOf).orNull, am.getBytes("UTF-8"),
          bs.map(java.lang.Long.valueOf).orNull,
          bq.map(java.lang.Long.valueOf).orNull, bm.getBytes("UTF-8")) < 0
      }
    Merge.mergeRewardMaps(sorted.map(_._3))
  }

  private def aggColumn = GraftColumn.of(RewardMergeAgg(
    GraftColumn.expr(col("src").cast("long")),
    GraftColumn.expr(col("seq")),
    GraftColumn.expr(col("rewards"))).toAggregateExpression()).as("_rw")

  test("bit-identical to the sorted collect_list fold on adversarial inputs") {
    import spark.implicits._
    val rnd = new Random(20260813L)
    val keys = Seq("a", "b", "k1", "k2", "zz", "é", "0")
    def randomValue(): String = rnd.nextInt(6) match {
      case 0 => rnd.nextInt(1000).toString                 // integral stays integral
      case 1 => (rnd.nextDouble() * 100 - 50).toString      // float
      case 2 => "\"s" + rnd.nextInt(10) + "\""              // string → sums as 0.0
      case 3 => "true"                                       // boolean → 0.0
      case 4 => "[1,2]"                                      // container → 0.0
      case 5 => "-" + rnd.nextInt(100)
    }
    def randomMap(): String = rnd.nextInt(10) match {
      case 0 => "{}"
      case 1 => "not json"
      case 2 => null
      case _ =>
        val n = 1 + rnd.nextInt(3)
        // duplicate keys across maps are the point; inside one map
        // jackson keeps the last duplicate, so generate distinct keys
        val ks = rnd.shuffle(keys).take(n)
        ks.map(k => s""""$k":${randomValue()}""").mkString("{", ",", "}")
    }
    // 40 trials ride one DataFrame as 40 groups; small src/seq pools
    // force full-tuple ties that only the map-byte comparison breaks,
    // and ~1/6 of srcs AND seqs are NULL (both must participate,
    // sorting first — seq draws include a NEGATIVE value so a
    // null-coerced-to-0 regression would order after it and fail)
    val trials = (0 until 40).map { g =>
      g -> (0 until (1 + rnd.nextInt(12))).map { _ =>
        (if (rnd.nextInt(6) == 0) None else Some(rnd.nextInt(2).toLong),
          if (rnd.nextInt(6) == 0) None else Some((rnd.nextInt(4) - 1).toLong),
          randomMap())
      }
    }
    val df = trials.flatMap { case (g, rows) =>
      rows.map { case (s, q, m) => (g, s, q, m) }
    }.toDF("g", "src", "seq", "rewards")
      .repartition(7) // partial buffers must serialize + merge across tasks
    val actual = df.groupBy("g").agg(aggColumn)
      .select(col("g"), col("_rw.rewards"), col("_rw.reward"))
      .as[(Int, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    trials.foreach { case (g, rows) =>
      val expected = oldFoldOpt(rows)
      assert(actual(g) == expected, s"trial $g: ${actual(g)} != $expected rows=$rows")
    }
  }

  test("null src rows participate and sort first — parity with the literal sort_array fold") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    val df = Seq(
      (Some(1L), Some(5L), """{"k":1}"""),
      (None: Option[Long], Some(9L), """{"k":2,"z":7}"""), // null src: earliest precedence
      (Some(0L), None: Option[Long], """{"k":3,"y":4}"""), // null seq sorts before -1
      (Some(0L), Some(-1L), """{"k":5}"""))
      .toDF("src", "seq", "rewards")
    // the replaced implementation, verbatim, run via actual sort_array
    val oldUdf = udf((maps: Seq[Row]) => Merge.mergeRewardMaps(maps.map(_.getString(2))))
    val old = df.agg(oldUdf(sort_array(collect_list(
        when(col("rewards").isNotNull, struct(col("src"), col("seq"), col("rewards")))))).as("o"))
      .select(col("o._1"), col("o._2")).as[(String, Double)].head()
    val neu = df.agg(aggColumn)
      .select(col("_rw.rewards"), col("_rw.reward")).as[(String, Double)].head()
    assert(neu == old)
    // z survives only if the null-src map was not dropped
    assert(neu._1.contains("\"z\":7"), neu._1)
  }

  test("aggregation buffer is bounded by distinct keys, not row count") {
    val agg = RewardMergeAgg(
      BoundReference(0, LongType, nullable = false),
      BoundReference(1, LongType, nullable = false),
      BoundReference(2, StringType, nullable = true))
    val buffer = agg.createAggregationBuffer()
    var i = 0
    while (i < 100000) {
      val row = new GenericInternalRow(Array[Any](
        (i % 2).toLong, (i % 97).toLong,
        UTF8String.fromString(s"""{"k${i % 10}":${i % 1000}}""")))
      agg.update(buffer, row)
      i += 1
    }
    assert(buffer.size == 10, s"10 distinct keys must mean 10 entries, got ${buffer.size}")
    val ser = agg.serialize(buffer)
    assert(ser.length < 4096, s"1e5 rows over 10 keys serialized to ${ser.length} bytes")
    // and the result still matches the old fold over all 1e5 rows
    val rows = (0 until 100000).map(i =>
      ((i % 2).toLong, (i % 97).toLong, s"""{"k${i % 10}":${i % 1000}}"""))
    val expected = oldFold(rows)
    val out = agg.eval(buffer).asInstanceOf[InternalRow]
    assert((out.getUTF8String(0).toString, out.getDouble(1)) == expected)
  }

  test("identical results under sort-based aggregation fallback (spill path)") {
    import spark.implicits._
    // ObjectHashAggregate falls back to sort-based aggregation past
    // this many distinct keys in the hash map — the 100 TB spill path.
    // The fallback exercises serialize/deserialize + merge of partial
    // buffers in a way the in-memory path does not.
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val old = spark.conf.get(key, "128")
    try {
      val rows = (0 until 500).map { i =>
        (i % 50, (i % 2).toLong, (i % 7).toLong, s"""{"k${i % 5}":${i % 100}}""")
      }
      val df = rows.toDF("g", "src", "seq", "rewards").repartition(5)
      def run(): Map[Int, (String, Double)] =
        df.groupBy("g").agg(aggColumn)
          .select(col("g"), col("_rw.rewards"), col("_rw.reward"))
          .as[(Int, String, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val normal = run()
      spark.conf.set(key, "2") // force fallback after 2 hash-map keys
      val spilled = run()
      assert(spilled == normal)
      // and both match the reference fold
      rows.groupBy(_._1).foreach { case (g, rs) =>
        assert(normal(g) == oldFold(rs.map(t => (t._2, t._3, t._4))), s"group $g")
      }
    } finally spark.conf.set(key, old)
  }

  test("merge plan runs partial then final aggregation (map-side combine)") {
    import spark.implicits._
    val df = Seq((1, 0L, 1L, """{"a":1}"""), (1, 0L, 2L, """{"b":2}"""))
      .toDF("g", "src", "seq", "rewards").repartition(2)
    val q = df.groupBy("g").agg(aggColumn)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    // TypedImperativeAggregate plans as ObjectHashAggregate; the
    // function must appear in BOTH a partial and a final node so
    // duplicate keys collapse before the exchange
    assert(plan.contains("ObjectHashAggregate"), plan)
    val occurrences = "merge_reward_maps".r.findAllIn(plan).size
    assert(occurrences >= 2, s"expected partial+final, plan:\n$plan")
    assert(plan.contains("partial_merge_reward_maps") || plan.contains("partial merge_reward_maps") ||
      plan.toLowerCase.contains("partial"), plan)
  }

  test("hot decision_id with 1e5 rewards merges through the full path") {
    import spark.implicits._
    import graft.schema.Schema
    val decisionId = "2PjCcQ3KUDvRzJzbS5V4wNX8XyZ"
    val rewards = (1 to 100000).map { i =>
      (decisionId, None: Option[String], None: Option[String], None: Option[Double],
        None: Option[String], Some(s"""{"r$i":1}"""), "m")
    }
    val decision = Seq((decisionId, Some("\"item\""), Some("{}"), Some(1.0),
      None: Option[String], None: Option[String], "m"))
    val df = (decision ++ rewards)
      .toDF(Schema.DecisionId, Schema.Item, Schema.Context, Schema.Count,
        Schema.Sample, Schema.Rewards, Schema.Model)
      .repartition(32)
    val merged = Merge.merge(df).collect()
    assert(merged.length == 1)
    val row = merged(0)
    assert(row.getAs[Double](Schema.Reward) == 100000.0)
    // every distinct message-id key survives the union
    val node = graft.core.CanonicalJson.parse(row.getAs[String](Schema.Rewards))
    assert(node.size() == 100000)
  }

  test("non-integral src/seq types are rejected at analysis time") {
    import spark.implicits._
    // update() folds src/seq via Number.longValue; a Decimal column
    // used to surface as a mid-aggregation MatchError — it must be an
    // analysis-time failure instead
    val df = Seq((BigDecimal(1), 1L, """{"k":1}""")).toDF("src", "seq", "rewards")
    val bad = GraftColumn.of(RewardMergeAgg(
      GraftColumn.expr(col("src")), // DecimalType
      GraftColumn.expr(col("seq")),
      GraftColumn.expr(col("rewards"))).toAggregateExpression()).as("_rw")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.groupBy().agg(bad).collect()
    }
    assert(e.getMessage.toLowerCase.contains("integral"), e.getMessage)
  }
}
