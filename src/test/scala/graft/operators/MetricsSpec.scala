package graft.operators

import org.apache.spark.sql.expressions.Window
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

  // ------------------------------------------------------------ prCurve

  test("prCurve matches a brute-force threshold sweep") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 300).map(_ => (rnd.nextInt(2), rnd.nextInt(15) / 10.0))
    val got = Metrics.prCurve(rows.toDF("y", "score").repartition(6),
      "y", "score").orderBy("thr_rank").collect()

    val p = rows.count(_._1 != 0).toLong
    val thresholds = rows.map(_._2).distinct.sorted.reverse
    assert(got.length === thresholds.length)
    var apTerms = 0L
    thresholds.zipWithIndex.foreach { case (t, i) =>
      val pred = rows.filter(_._2 >= t)
      val tp = pred.count(_._1 != 0).toLong
      val fp = pred.size - tp
      val np = rows.count(r => r._2 == t && r._1 != 0).toLong
      val r = got(i)
      assert(r.getAs[Long]("thr_rank") === i + 1)
      assert(r.getAs[Long]("n_pred") === pred.size.toLong)
      assert(r.getAs[Long]("tp") === tp && r.getAs[Long]("fp") === fp)
      val prec = tp * 1000000L / pred.size
      assert(r.getAs[Long]("prec_ppm") === prec)
      assert(r.getAs[Long]("recall_ppm") === tp * 1000000L / p)
      apTerms += np * prec
    }
    assert(got.forall(_.getAs[Long]("ap_ppm") === apTerms / p))
    // final threshold predicts everything; recall there is 1
    assert(got.last.getAs[Long]("recall_ppm") === 1000000L)
  }

  test("prCurve with no positives yields null recall/AP, exact fp") {
    val rows = Seq((0, 0.9), (0, 0.5), (0, 0.5))
    val got = Metrics.prCurve(rows.toDF("y", "score"), "y", "score")
      .orderBy("thr_rank").collect()
    assert(got.length === 2)
    assert(got.forall(r => r.isNullAt(r.fieldIndex("recall_ppm"))
      && r.isNullAt(r.fieldIndex("ap_ppm"))
      && r.getAs[Long]("prec_ppm") === 0L))
    assert(got.last.getAs[Long]("fp") === 3L)
  }

  // ----------------------------------------------------- rankingMetrics

  /** Brute-force nDCG/RR with the SAME quantized discount table. */
  private def rankBrute(items: Seq[(Int, Int)], k: Int)
      : (Long, Long, Long, Option[Long]) = {
    val w = Metrics.discountsX1e6(k)
    val top = items.filter(t => t._1 >= 1 && t._1 <= k)
    def gain(rel: Int) = (1L << rel) - 1
    val dcg = top.map { case (r, rel) => gain(rel) * w(r - 1) }.sum
    val ideal = top.sortBy { case (r, rel) => (-rel, r) }
    val idcg = ideal.zipWithIndex.map { case ((_, rel), i) =>
      gain(rel) * w(i)
    }.sum
    val firstRel = top.filter(_._2 > 0).map(_._1).sorted.headOption
    val rr = firstRel.map(1000000L / _).getOrElse(0L)
    (dcg, idcg, rr,
      if (idcg == 0) None else Some(dcg * 1000000L / idcg))
  }

  test("rankingMetrics matches brute force on random graded lists") {
    val rnd = new scala.util.Random(5)
    val rows = for (q <- 0 until 40; r <- 1 to 10)
      yield (q.toLong, r, rnd.nextInt(3))
    val got = Metrics.rankingMetrics(
      rows.toDF("qid", "rank", "rel").repartition(7), "qid", "rank", "rel")
      .collect().map(r => r.getAs[Long]("qid") -> r).toMap
    for (q <- 0L until 40L) {
      val items = rows.filter(_._1 == q).map(t => (t._2, t._3))
      val (dcg, idcg, rr, ndcg) = rankBrute(items, 10)
      val r = got(q)
      assert(r.getAs[Long]("dcg_x1e6") === dcg, s"q$q dcg")
      assert(r.getAs[Long]("idcg_x1e6") === idcg, s"q$q idcg")
      assert(r.getAs[Long]("rr_x1e6") === rr, s"q$q rr")
      ndcg match {
        case Some(v) => assert(r.getAs[Long]("ndcg_ppm") === v, s"q$q ndcg")
        case None => assert(r.isNullAt(r.fieldIndex("ndcg_ppm")), s"q$q ndcg")
      }
    }
  }

  test("rankingMetrics edges: perfect order, no relevant, short lists, rank>k") {
    // perfectly ordered by rel -> ndcg exactly 1e6
    val perfect = Seq((1L, 1, 2), (1L, 2, 1), (1L, 3, 0))
    val p = Metrics.rankingMetrics(
      perfect.toDF("qid", "rank", "rel"), "qid", "rank", "rel").head()
    assert(p.getAs[Long]("ndcg_ppm") === 1000000L)
    assert(p.getAs[Long]("rr_x1e6") === 1000000L)
    // no relevant -> idcg 0, ndcg null, rr 0 (counts against the system)
    val none = Seq((2L, 1, 0), (2L, 2, 0))
    val n = Metrics.rankingMetrics(
      none.toDF("qid", "rank", "rel"), "qid", "rank", "rel").head()
    assert(n.isNullAt(n.fieldIndex("ndcg_ppm")))
    assert(n.getAs[Long]("rr_x1e6") === 0L)
    assert(n.isNullAt(n.fieldIndex("first_rel_rank")))
    // rows beyond k are ignored entirely
    val withTail = Seq((3L, 1, 0), (3L, 2, 2), (3L, 11, 2))
    val t = Metrics.rankingMetrics(
      withTail.toDF("qid", "rank", "rel"), "qid", "rank", "rel").head()
    assert(t.getAs[Long]("n_ret") === 2L)
    assert(t.getAs[Long]("first_rel_rank") === 2L)
    assert(t.getAs[Long]("rr_x1e6") === 500000L)
    // reversed order: dcg < idcg, ndcg < 1e6 but > 0
    val worst = Seq((4L, 1, 0), (4L, 2, 0), (4L, 3, 2))
    val wv = Metrics.rankingMetrics(
      worst.toDF("qid", "rank", "rel"), "qid", "rank", "rel").head()
    assert(wv.getAs[Long]("ndcg_ppm") === 500000L)
  }

  test("discount table is the quantized 1e6/log2(r+1) ladder") {
    val w = Metrics.discountsX1e6(10)
    assert(w.head === 1000000L) // log2(2) = 1
    assert(w(2) === 500000L)    // log2(4) = 2
    assert(w === w.sorted.reverse && w.length === 10)
  }

  // --------------------------------------------------- quantileNormalize

  test("quantileNormalize matches the plain percent_rank window, edges included") {
    val rnd = new scala.util.Random(13)
    val rows = (0 until 300).map { i =>
      val g: Option[String] = if (i == 0) None else Some(s"s${i % 4}")
      val v: Option[Long] = if (i % 11 == 0) None else Some(rnd.nextInt(20).toLong)
      (i.toLong, g, v)
    } :+ ((1000L, Option("solo"), Option(5L))) // single-row group -> pct 0
    val df = rows.toDF("id", "g", "v").repartition(7)
    val got = Metrics.quantileNormalize(df, "g", "v", "id")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("group_rank"), r.getAs[Long]("pct_x1e6"))).toMap
    assert(got.size === rows.size) // no row lost to null group/value joins
    // reference: plain window rank (nulls first) + percent arithmetic
    val w = Window.partitionBy("g").orderBy(col("v").asc, col("id").asc)
    val expect = df
      .withColumn("rnk", row_number().over(w).cast("long"))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy("g")))
      .collect().map { r =>
        val (rnk, cnt) = (r.getAs[Long]("rnk"), r.getAs[Long]("cnt"))
        r.getAs[Long]("id") ->
          ((rnk, if (cnt <= 1) 0L else (rnk - 1) * 1000000L / (cnt - 1)))
      }.toMap
    assert(got === expect)
    assert(got(1000L) === ((1L, 0L)))
  }

  // -------------------------------------------------------------- brier

  test("brier is the exact integer mean squared residual, grouped") {
    // cohort 0: p=1e6,y=1 (perfect) and p=0,y=1 (worst) -> mean 5e11
    // cohort 1: p=250000,y=0 -> 62500000000 exactly
    val rows = Seq(
      (0, 1, 1000000L), (0, 1, 0L),
      (1, 0, 250000L))
    val got = Metrics.brier(rows.toDF("g", "y", "p"), "p", "y", Seq("g"))
      .orderBy("g").collect()
    assert(got(0).getAs[Long]("brier_x1e12") === 500000000000L)
    assert(got(0).getAs[Long]("n") === 2 && got(0).getAs[Long]("n_pos") === 2)
    assert(got(1).getAs[Long]("brier_x1e12") === 62500000000L)
    // global (ungrouped) variant: one row, exact pooled mean
    val all = Metrics.brier(rows.toDF("g", "y", "p"), "p", "y").head()
    assert(all.getAs[Long]("brier_x1e12") ===
      (1000000L * 1000000L + 62500000000L * 1) / 3)
    // perfectly calibrated hard predictions -> 0
    val perfect = Seq((1, 1000000L), (0, 0L)).toDF("y", "p")
    assert(Metrics.brier(perfect, "p", "y").head()
      .getAs[Long]("brier_x1e12") === 0L)
  }

  // ------------------------------------------------- calibrationEqualMass

  test("calibrationEqualMass bins hold equal mass and reuse the exact ratios") {
    // 20 rows, 4 bins -> 5 rows per bin exactly; p = rank * 1000
    val rows = (0 until 20).map(i => (i.toLong, i % 2, i * 1000L))
    val got = Metrics.calibrationEqualMass(
      rows.toDF("id", "y", "p").repartition(5), "p", "y", "id", bins = 4)
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Long]("n")).toSeq === Seq(5L, 5L, 5L, 5L))
    assert(got.map(_.getAs[Long]("bin")).toSeq === Seq(0L, 1L, 2L, 3L))
    // bin 0 holds p in 0..4000: conf = (0+1+2+3+4)*1000/5 = 2000
    assert(got(0).getAs[Long]("conf_x1e6") === 2000L)
    assert(got(0).getAs[Long]("n_pos") === 2L) // ids 1, 3
    // a concentrated distribution still spreads across bins (tie split)
    val conc = (0 until 100).map(i => (i.toLong, i % 2, 500000L))
    val g2 = Metrics.calibrationEqualMass(
      conc.toDF("id", "y", "p"), "p", "y", "id", bins = 10)
      .orderBy("bin").collect()
    assert(g2.length === 10)
    assert(g2.map(_.getAs[Long]("n")).sum === 100L)
    assert(g2.forall(_.getAs[Long]("n") === 10L))
  }

  // ---------------------------------------------------- mutualInformation

  test("mutualInformation matches hand-computed terms on a 2x2 table") {
    // cells: (a,0)=4 (a,1)=1 (b,0)=1 (b,1)=4, N=10
    val rows = Seq.fill(4)(("a", 0)) ++ Seq(("a", 1), ("b", 0)) ++
      Seq.fill(4)(("b", 1))
    val got = Metrics.mutualInformation(
      rows.toDF("f", "y").repartition(4), "f", "y")
      .orderBy("x", "y").collect()
    assert(got.length === 4)
    def term(nxy: Long, nx: Long, ny: Long, n: Double): Long =
      Math.round((nxy / n) * Math.log((nxy / n) / ((nx / n) * (ny / n))) * 1e9)
    val expect = Seq(
      ("a", 0, 4L), ("a", 1, 1L), ("b", 0, 1L), ("b", 1, 4L))
      .map { case (x, y, nxy) => term(nxy, 5L, 5L, 10.0) }
    got.zip(expect).foreach { case (r, e) =>
      assert(r.getAs[Long]("mi_term_x1e9") === e)
      assert(r.getAs[Long]("n_x") === 5L && r.getAs[Long]("n_y") === 5L)
    }
    val total = expect.sum
    assert(got.forall(_.getAs[Long]("mi_x1e9") === total))
    assert(total > 0L) // dependent table -> strictly positive MI
  }

  test("mutualInformation is exactly zero under independence and drops nulls") {
    // perfectly independent uniform 2x3: every term is ln(1) = 0
    val rows = for (x <- Seq("a", "b"); y <- 0 until 3; _ <- 0 until 5)
      yield (x, y)
    val got = Metrics.mutualInformation(rows.toDF("f", "y"), "f", "y")
      .collect()
    assert(got.length === 6)
    assert(got.forall(_.getAs[Long]("mi_term_x1e9") === 0L))
    assert(got.forall(_.getAs[Long]("mi_x1e9") === 0L))
    val withNulls = Seq((Some("a"), Some(1)), (None, Some(1)),
      (Some("a"), None)).toDF("f", "y")
    val g2 = Metrics.mutualInformation(withNulls, "f", "y").collect()
    assert(g2.length === 1 && g2.head.getAs[Long]("n_xy") === 1L)
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
