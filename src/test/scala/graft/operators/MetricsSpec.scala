package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class MetricsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---------------------------------------------------------------- AUC

  /** Brute-force tie-aware AUC ×1e6 (truncating, mirroring the
    * operator's integer div): counts correctly-ordered pos/neg pairs,
    * ties at half weight, over the raw (label, score) list.
    */
  private def aucBrute(rows: Seq[(Int, Double)]): Option[Long] = {
    val pos = rows.filter(_._1 != 0).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    if (pos.isEmpty || neg.isEmpty) None
    else {
      val u2 = (for (p <- pos; n <- neg)
        yield if (p > n) 2L else if (p == n) 1L else 0L).sum
      Some(u2 * 1000000L / (2L * pos.size * neg.size))
    }
  }

  test("aucExact matches brute-force pair counting on a random corpus with ties") {
    val rnd = new scala.util.Random(42)
    // scores drawn from a SMALL grid so ties are common
    val rows = (0 until 400).map(_ => (rnd.nextInt(2), rnd.nextInt(12) / 10.0))
    val got = Metrics.aucExact(
      rows.toDF("y", "score").repartition(7), "y", "score")
      .head()
    assert(got.getAs[Long]("n_pos") === rows.count(_._1 != 0))
    assert(got.getAs[Long]("n_neg") === rows.count(_._1 == 0))
    assert(got.getAs[Long]("auc_x1e6") === aucBrute(rows).get)
  }

  test("aucExact per-group matches per-group brute force") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 300).map(i =>
      (i % 3, rnd.nextInt(2), rnd.nextInt(8) / 4.0))
    val got = Metrics.aucExact(
      rows.toDF("g", "y", "score").repartition(5), "y", "score", Seq("g"))
      .collect().map(r => r.getAs[Int]("g") -> r.getAs[Long]("auc_x1e6")).toMap
    for (g <- 0 until 3) {
      val expect = aucBrute(rows.filter(_._1 == g).map(t => (t._2, t._3))).get
      assert(got(g) === expect, s"group $g")
    }
  }

  test("aucExact degenerate and boundary cases") {
    // perfect separation -> 1.0; inverted -> 0.0
    val perfect = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))
    assert(Metrics.aucExact(perfect.toDF("y", "score"), "y", "score")
      .head().getAs[Long]("auc_x1e6") === 1000000L)
    val inverted = perfect.map { case (y, s) => (1 - y, s) }
    assert(Metrics.aucExact(inverted.toDF("y", "score"), "y", "score")
      .head().getAs[Long]("auc_x1e6") === 0L)
    // single class -> null AUC (undefined, not 0)
    val onlyPos = Seq((1, 0.5), (1, 0.6)).toDF("y", "score")
    assert(Metrics.aucExact(onlyPos, "y", "score").head().isNullAt(
      Metrics.aucExact(onlyPos, "y", "score").schema.fieldIndex("auc_x1e6")))
    // all scores identical -> 0.5 exactly (pure tie credit)
    val flat = Seq((1, 0.3), (0, 0.3), (1, 0.3), (0, 0.3)).toDF("y", "score")
    assert(Metrics.aucExact(flat, "y", "score")
      .head().getAs[Long]("auc_x1e6") === 500000L)
    // null scores/labels are excluded, not scored
    val withNulls = Seq(
      (Some(1), Some(0.9)), (Some(0), Some(0.1)),
      (None, Some(0.5)), (Some(1), None))
      .toDF("y", "score")
    val r = Metrics.aucExact(withNulls, "y", "score").head()
    assert(r.getAs[Long]("n_pos") === 1L && r.getAs[Long]("n_neg") === 1L)
    assert(r.getAs[Long]("auc_x1e6") === 1000000L)
  }

  // ---------------------------------------------------- calibration/ECE

  test("calibration bins, ratios, and ECE are exact integer arithmetic") {
    // bin width 1e5; constructed so every ratio is exact
    val rows = Seq(
      (1, 50000L), (0, 150000L), (1, 150000L), // bin 0: n=1; bin 1: n=2
      (1, 1000000L), (0, 999999L), (1, 950000L)) // p=1e6 folds into bin 9
    val got = Metrics.calibration(rows.toDF("y", "p"), "p", "y", bins = 10)
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Long]("bin")).toSeq === Seq(0L, 1L, 9L))
    val b0 = got(0); val b1 = got(1); val b9 = got(2)
    assert(b0.getAs[Long]("n") === 1 && b0.getAs[Long]("acc_x1e6") === 1000000L
      && b0.getAs[Long]("conf_x1e6") === 50000L && b0.getAs[Long]("gap_x1e6") === 950000L)
    assert(b1.getAs[Long]("n") === 2 && b1.getAs[Long]("acc_x1e6") === 500000L
      && b1.getAs[Long]("conf_x1e6") === 150000L)
    assert(b9.getAs[Long]("n") === 3 && b9.getAs[Long]("n_pos") === 2)
    // conf bin9 = (1000000+999999+950000)/3 = 983333 (truncating)
    assert(b9.getAs[Long]("conf_x1e6") === 983333L)
    // ECE = (1*950000 + 2*350000 + 3*|666666-983333|) / 6
    val ece = (1L * 950000L + 2L * 350000L + 3L * (983333L - 666666L)) / 6L
    assert(got.forall(_.getAs[Long]("ece_x1e6") === ece))
  }

  test("calibration drops null prob/label rows and handles empty input") {
    val rows = Seq((Some(1), Some(100000L)), (None, Some(100000L)),
      (Some(0), None))
    val got = Metrics.calibration(rows.toDF("y", "p"), "p", "y").collect()
    assert(got.length === 1 && got.head.getAs[Long]("n") === 1)
    val empty = Metrics.calibration(
      Seq.empty[(Int, Long)].toDF("y", "p"), "p", "y")
    assert(empty.count() === 0)
  }

  // ------------------------------------------------------------ tokenF1

  test("tokenF1 multiset overlap, precision/recall asymmetry, empties") {
    val pairs = Seq(
      (1L, "a b c", "a b c"),          // identical -> F1 = 1
      (2L, "a a b", "a c c"),          // multiset: overlap=min counts=1
      (3L, "x y", "p q"),              // disjoint -> 0
      (4L, "  a   b ", "a b"),         // whitespace runs collapse
      (5L, "", "a b"),                 // empty pred -> null P, 0 recall
      (6L, null, "a b"))               // null pred -> null metrics
      .toDF("pair_id", "pred", "ref")
    val got = Metrics.tokenF1(pairs, "pair_id", "pred", "ref")
      .orderBy("pair_id").collect()

    assert(got(0).getAs[Long]("f1_x1e6") === 1000000L)
    assert(got(0).getAs[Long]("overlap") === 3L)

    // pair 2: pred {a:2, b:1}, ref {a:1, c:2} -> overlap 1; P=1/3 R=1/3
    assert(got(1).getAs[Long]("overlap") === 1L)
    assert(got(1).getAs[Long]("precision_x1e6") === 333333L)
    assert(got(1).getAs[Long]("recall_x1e6") === 333333L)
    assert(got(1).getAs[Long]("f1_x1e6") === 333333L)

    assert(got(2).getAs[Long]("f1_x1e6") === 0L)

    // pair 4: "  a   b " splits to empty tokens too — they are
    // filtered, so lengths are 2 and overlap full
    assert(got(3).getAs[Long]("n_pred") === 2L)
    assert(got(3).getAs[Long]("f1_x1e6") === 1000000L)

    // pair 5: empty pred -> lp=0 -> precision null, recall 0, f1 0
    assert(got(4).getAs[Long]("n_pred") === 0L)
    assert(got(4).isNullAt(got(4).fieldIndex("precision_x1e6")))
    assert(got(4).getAs[Long]("recall_x1e6") === 0L)
    assert(got(4).getAs[Long]("f1_x1e6") === 0L)

    // pair 6: null pred -> null lengths -> null metrics
    assert(got(5).isNullAt(got(5).fieldIndex("n_pred")))
    assert(got(5).isNullAt(got(5).fieldIndex("f1_x1e6")))
  }

  test("tokenF1 is layout-independent") {
    val rnd = new scala.util.Random(3)
    val words = Vector("a", "b", "c", "d", "e")
    def text() = Seq.fill(rnd.nextInt(8))(words(rnd.nextInt(5))).mkString(" ")
    val pairs = (0L until 50L).map(i => (i, text(), text()))
    val a = Metrics.tokenF1(pairs.toDF("pair_id", "pred", "ref").coalesce(1),
      "pair_id", "pred", "ref").orderBy("pair_id").collect().toSeq
    val b = Metrics.tokenF1(pairs.toDF("pair_id", "pred", "ref").repartition(9),
      "pair_id", "pred", "ref").orderBy("pair_id").collect().toSeq
    assert(a === b)
  }
}
