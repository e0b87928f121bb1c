package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class TemporalSpec extends AnyFunSuite with SparkTestBase {

  // trades ← quotes fixture: long ts columns (the operator accepts
  // timestamps or numerics; the gate queries cover TimestampType)
  private def trades = {
    import spark.implicits._
    Seq(
      ("A", 100L, "t1"),
      ("A", 205L, "t2"),
      ("A", 300L, "t3"), // exactly at a quote ts
      ("B", 50L, "t4"),  // before any B quote
      ("C", 10L, "t5")   // key with no quotes at all
    ).toDF("sym", "ts", "trade")
  }

  private def quotes = {
    import spark.implicits._
    Seq(
      ("A", 90L, 1.0),
      ("A", 200L, 2.0),
      ("A", 300L, 3.0),
      ("A", 400L, 4.0),
      ("B", 60L, 5.0)
    ).toDF("sym", "ts", "px")
  }

  private def matchesOf(df: org.apache.spark.sql.DataFrame): Map[String, Option[Double]] =
    df.collect().map { r =>
      r.getString(r.fieldIndex("trade")) ->
        (if (r.isNullAt(r.fieldIndex("r_px"))) None
         else Some(r.getDouble(r.fieldIndex("r_px"))))
    }.toMap

  test("backward inclusive: greatest quote ts <= trade ts; no-match rows survive as null") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "ts")
    assert(out.count() == 5)
    assert(matchesOf(out) == Map(
      "t1" -> Some(1.0), "t2" -> Some(2.0), "t3" -> Some(3.0),
      "t4" -> None, "t5" -> None))
  }

  test("strict excludes the equal-timestamp quote") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "ts", strict = true)
    assert(matchesOf(out)("t3") == Some(2.0)) // 300 itself excluded, falls back to 200
  }

  test("forward picks the least quote ts >= trade ts") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
      direction = "forward")
    assert(matchesOf(out) == Map(
      "t1" -> Some(2.0), // 200 is the first quote >= 100
      "t2" -> Some(3.0),
      "t3" -> Some(3.0), // inclusive: 300 matches itself
      "t4" -> Some(5.0),
      "t5" -> None))
  }

  test("tolerance nulls matches farther than the bound") {
    val out = Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "ts",
      toleranceUs = Some(5L))
    assert(matchesOf(out) == Map(
      "t1" -> None,      // gap 10 > 5
      "t2" -> Some(2.0), // gap 5 allowed (inclusive)
      "t3" -> Some(3.0), // gap 0
      "t4" -> None, "t5" -> None))
  }

  test("null timestamps: left rows pass through unmatched, right rows never match") {
    import spark.implicits._
    val l = Seq(("A", Some(100L), "ok"), ("A", None, "nullts"))
      .toDF("sym", "ts", "trade")
    val r = Seq(("A", Some(90L), 1.0), ("A", None, 99.0))
      .toDF("sym", "ts", "px")
    val out = Temporal.asofJoin(l, r, Seq("sym"), "ts", "ts")
    assert(out.count() == 2)
    val m = out.collect().map(x =>
      x.getString(x.fieldIndex("trade")) -> x.isNullAt(x.fieldIndex("r_px"))).toMap
    assert(m == Map("ok" -> false, "nullts" -> true))
    // and the null-ts quote (px=99) was never the match
    assert(matchesOf(out)("ok") == Some(1.0))
  }

  test("right-side ties at one timestamp resolve deterministically to a single row") {
    import spark.implicits._
    val l = Seq(("A", 100L, "t")).toDF("sym", "ts", "trade")
    val r = Seq(("A", 90L, 1.0), ("A", 90L, 2.0), ("A", 90L, 3.0))
      .toDF("sym", "ts", "px")
    val first = Temporal.asofJoin(l, r, Seq("sym"), "ts", "ts").collect()
    assert(first.length == 1)
    // rerun with different partitioning — same winner (content-hash tiebreak)
    val second = Temporal.asofJoin(l.repartition(7), r.repartition(5),
      Seq("sym"), "ts", "ts").collect()
    assert(first.map(_.toString).toSeq == second.map(_.toString).toSeq)
  }

  test("asofJoin equals per-row brute force on random data (both directions)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val ls = (1 to 300).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i))
    val rs = (1 to 300).map(i => (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i.toDouble))
    val l = ls.toDF("k", "ts", "lid")
    val r = rs.toDF("k", "ts", "px")

    // brute force: max px among right rows at the winning timestamp is
    // not well-defined under ties, so compare the matched TIMESTAMP
    // (tie-invariant) per left row
    def brute(forward: Boolean): Map[Int, Option[Long]] =
      ls.map { case (k, ts, lid) =>
        val c = rs.filter(q => q._1 == k && (if (forward) q._2 >= ts else q._2 <= ts))
        lid -> (if (c.isEmpty) None
                else Some(if (forward) c.map(_._2).min else c.map(_._2).max))
      }.toMap

    for (dir <- Seq("backward", "forward")) {
      val got = Temporal.asofJoin(l, r, Seq("k"), "ts", "ts", direction = dir)
        .collect().map { row =>
          row.getInt(row.fieldIndex("lid")) ->
            (if (row.isNullAt(row.fieldIndex("r_ts"))) None
             else Some(row.getLong(row.fieldIndex("r_ts"))))
        }.toMap
      assert(got == brute(dir == "forward"), s"direction=$dir")
    }
  }

  test("rangeJoin equals brute-force inequality join, bounds inclusive") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val ls = (1 to 200).map(i => (s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong, i))
    val rs = (1 to 200).map(i => (s"k${rnd.nextInt(4)}", rnd.nextInt(500).toLong, i))
    val l = ls.toDF("k", "ts", "lid")
    val r = rs.toDF("k", "ts", "rid")

    // asymmetric window crossing zero, plus windows strictly negative
    // and strictly positive (bucket arithmetic must hold for all signs)
    for ((lo, hi) <- Seq((-50L, 120L), (-80L, -10L), (5L, 60L))) {
      val got = Temporal.rangeJoin(l, r, Seq("k"), "ts", "ts", lo, hi)
        .select("lid", "r_rid").collect()
        .map(x => (x.getInt(0), x.getInt(1))).sorted.toSeq
      val want = (for {
        (lk, lts, lid) <- ls
        (rk, rts, rid) <- rs
        if rk == lk && rts >= lts + lo && rts <= lts + hi
      } yield (lid, rid)).sorted
      assert(got == want, s"range [$lo, $hi]")
      // exact bound inclusivity: planted pair at each edge
      val le = Seq(("e", 100L, 0)).toDF("k", "ts", "lid")
      val re = Seq(("e", 100L + lo, 1), ("e", 100L + hi, 2),
        ("e", 100L + lo - 1, 3), ("e", 100L + hi + 1, 4)).toDF("k", "ts", "rid")
      val edge = Temporal.rangeJoin(le, re, Seq("k"), "ts", "ts", lo, hi)
        .select("r_rid").collect().map(_.getInt(0)).sorted.toSeq
      assert(edge == Seq(1, 2), s"edge bounds for [$lo, $hi]")
    }
  }

  test("rangeJoin plan is a shuffle equi-join, not a nested loop") {
    import spark.implicits._
    val l = (1 to 100).map(i => ("k", i.toLong, i)).toDF("k", "ts", "lid")
    val r = (1 to 100).map(i => ("k", i.toLong, i)).toDF("k", "ts", "rid")
    val plan = Temporal.rangeJoin(l, r, Seq("k"), "ts", "ts", -10L, 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("guards: bad direction, negative tolerance, empty range") {
    intercept[IllegalArgumentException](
      Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "ts", direction = "sideways"))
    intercept[IllegalArgumentException](
      Temporal.asofJoin(trades, quotes, Seq("sym"), "ts", "ts", toleranceUs = Some(-1L)))
    intercept[IllegalArgumentException](
      Temporal.rangeJoin(trades, quotes, Seq("sym"), "ts", "ts", 10L, 5L))
  }

  test("null join keys never match (consistent with rangeJoin's equi-join)") {
    import spark.implicits._
    val l = Seq((Option("A"), 100L, "t1"), (Option.empty[String], 100L, "t2"))
      .toDF("sym", "ts", "trade")
    val r = Seq((Option("A"), 90L, 1.0), (Option.empty[String], 90L, 9.9))
      .toDF("sym", "ts", "px")
    val out = Temporal.asofJoin(l, r, Seq("sym"), "ts", "ts")
      .collect().map(row => row.getString(row.fieldIndex("trade")) ->
        (if (row.isNullAt(row.fieldIndex("r_px"))) None
         else Some(row.getDouble(row.fieldIndex("r_px"))))).toMap
    assert(out == Map("t1" -> Some(1.0), "t2" -> None),
      s"null-keyed rows must pass through unmatched, got $out")
  }

  test("resample densifies each key's own span and forward-fills gaps") {
    import spark.implicits._
    // key a observes buckets 0,1,4 (gaps 2,3); key b observes only 7 —
    // its grid is a single bucket, NOT stretched to a's range
    val df = Seq(
      ("a", 5L, 1.0), ("a", 8L, 2.0),   // bucket 0: sum 3.0
      ("a", 15L, 4.0),                  // bucket 1
      ("a", 42L, 8.0),                  // bucket 4
      ("b", 75L, 16.0)                  // bucket 7
    ).toDF("k", "ts", "v")
    val out = Temporal.resample(df, Seq("k"), "ts", 10L,
        Seq("sv" -> sum(col("v"))))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
      .toSet
    assert(out == Set(
      ("a", 0L, false, 3.0),
      ("a", 10L, false, 4.0),
      ("a", 20L, true, 4.0),  // gap carries bucket 1's value
      ("a", 30L, true, 4.0),
      ("a", 40L, false, 8.0),
      ("b", 70L, false, 16.0)))
  }

  test("resample: null timestamps drop, multi-agg columns fill independently") {
    import spark.implicits._
    val df = Seq(
      (Some(5L), 1.0), (None, 99.0),    // null ts never lands anywhere
      (Some(25L), 3.0)
    ).map { case (ts, v) => ("k", ts, v) }.toDF("k", "ts", "v")
    val out = Temporal.resample(df, Seq("k"), "ts", 10L,
        Seq("sv" -> sum(col("v")), "n" -> count(lit(1))))
      .orderBy("bucket_us").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 10L, 20L))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.0, 1.0, 3.0)) // sv filled
    assert(out.map(_.getLong(4)).toSeq == Seq(1L, 1L, 1L))      // n filled
    assert(out.map(_.getBoolean(2)).toSeq == Seq(false, true, false))
    intercept[IllegalArgumentException](
      Temporal.resample(df, Seq("k"), "ts", 0L, Seq("sv" -> sum(col("v")))))
    intercept[IllegalArgumentException](
      Temporal.resample(df, Seq("k"), "ts", 10L, Seq.empty))
  }

  test("resample keeps null-key groups (null-safe grid join)") {
    import spark.implicits._
    val df = Seq((Option.empty[String], 5L, 1.0), (None: Option[String], 25L, 3.0),
      (Some("k"), 5L, 9.0))
      .toDF("k", "ts", "v")
    val out = Temporal.resample(df, Seq("k"), "ts", 10L, Seq("sv" -> sum(col("v"))))
      .collect().map(r => (Option(r.getString(0)), r.getLong(1), r.getBoolean(2), r.getDouble(3)))
    // the null-key group must have its OBSERVED buckets marked
    // observed with real aggregates, not all-gap nulls
    val nullGroup = out.filter(_._1.isEmpty).sortBy(_._2)
    assert(nullGroup.map(x => (x._2, x._3, x._4)).toSeq ==
      Seq((0L, false, 1.0), (10L, true, 1.0), (20L, false, 3.0)), nullGroup.toSeq)
    assert(out.filter(_._1.contains("k")).map(_._4).toSeq == Seq(9.0))
  }

  test("keyless (global) as-of join works; prefix collisions are rejected loudly") {
    import spark.implicits._
    val left = Seq((1L, 10L), (2L, 30L)).toDF("lid", "ts")
    val right = Seq((100L, 5L), (200L, 25L)).toDF("rid", "ts")
    val out = Temporal.asofJoin(left, right, Seq.empty, "ts", "ts")
      .select("lid", "r_rid").collect().map(r => r.getLong(0) -> r.get(1)).toMap
    assert(out == Map(1L -> 100L, 2L -> 200L), out)
    // a right column that prefixes into an existing left name
    val clash = left.withColumnRenamed("lid", "r_rid")
    val e = intercept[IllegalArgumentException] {
      Temporal.asofJoin(clash, right, Seq.empty, "ts", "ts")
    }
    assert(e.getMessage.contains("r_rid"), e.getMessage)
  }

  test("decayedSum: exact power-of-two half-life weights, ref from the corpus max") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-01-${day}%02d 12:00:00")
    // newest event day 29 -> ages 0, 7, 14, 21 days at halfLife 7
    val rows = Seq(
      (1L, ts(29), 100L), // age 0  -> weight 1e6
      (1L, ts(22), 100L), // age 7  -> weight 5e5
      (1L, ts(15), 100L), // age 14 -> weight 25e4
      (2L, ts(8), 400L))  // age 21 -> weight 125e3
    val got = Temporal.decayedSum(rows.toDF("user_id", "ts", "v")
      .repartition(3), Seq("user_id"), "ts", "v", halfLifeDays = 7)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("last_age_days"),
          r.getAs[Long]("decayed_x1e6"))).toMap
    assert(got(1L) === ((3L, 0L, 100L * 1000000L + 100L * 500000L + 100L * 250000L)))
    assert(got(2L) === ((1L, 21L, 400L * 125000L)))
    // capShift floors the weight instead of zeroing ancient events
    val old = Seq((9L, ts(1), 1000000L), (9L, ts(29), 0L))
    val capped = Temporal.decayedSum(old.toDF("user_id", "ts", "v"),
      Seq("user_id"), "ts", "v", halfLifeDays = 1, capShift = 3).collect()
    // age 28 days at halfLife 1 shifts 28 but caps at 3 -> weight 125000
    assert(capped.head.getAs[Long]("decayed_x1e6") === 1000000L * 125000L)
    // default capShift=19 floors the weight at exactly 1, never 0:
    // an event thousands of half-lives old still contributes value*1
    val ancient = Seq(
      (7L, Timestamp.valueOf("2020-01-01 00:00:00"), 5L),
      (7L, ts(29), 0L))
    val fl = Temporal.decayedSum(ancient.toDF("user_id", "ts", "v"),
      Seq("user_id"), "ts", "v", halfLifeDays = 1).head()
    assert(fl.getAs[Long]("decayed_x1e6") === 5L)
    // null ts/value rows are excluded but still anchor nothing
    val withNull = Seq(
      (5L, Option(ts(29)), Option(10L)),
      (5L, Option(ts(20)), None),
      (5L, None, Option(7L)))
      .toDF("user_id", "ts", "v")
    val g2 = Temporal.decayedSum(withNull, Seq("user_id"), "ts", "v", 7).head()
    assert(g2.getAs[Long]("n_events") === 1L)
    assert(g2.getAs[Long]("decayed_x1e6") === 10L * 1000000L)
  }

  test("intervalJoin = brute-force overlap join, each pair exactly once") {
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    // spans 0..5 buckets wide at bucketUs=100 — exercises multi-cell
    // replication and the canonical-cell dedup
    val lefts = (0 until 200).map { i =>
      val s = rnd.nextInt(10000).toLong
      (i.toLong, s, s + rnd.nextInt(500))
    }
    val rights = (0 until 150).map { j =>
      val s = rnd.nextInt(10000).toLong
      (j.toLong, s, s + rnd.nextInt(500))
    }
    val got = Temporal.intervalJoin(
      lefts.toDF("lid", "ls", "le"), rights.toDF("rid", "rs", "re"),
      Nil, "ls", "le", "rs", "re", bucketUs = 100L)
      .select("lid", "r_rid", "overlap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = for {
      (li, ls, le) <- lefts
      (ri, rs, re) <- rights
      if ls <= re && rs <= le
    } yield (li, ri, math.min(le, re) - math.max(ls, rs))
    // exact multiset equality: multiplicity 1 per overlapping pair
    assert(got.sorted.toSeq === expect.sorted.toSeq)
  }

  test("intervalJoin scopes overlap by the on-keys") {
    import spark.implicits._
    val l = Seq(("k1", 0L, 100L), ("k2", 0L, 100L)).toDF("k", "ls", "le")
    val r = Seq(("k1", 50L, 60L), ("k3", 50L, 60L)).toDF("k", "rs", "re")
    val got = Temporal.intervalJoin(l, r, Seq("k"),
      "ls", "le", "rs", "re", bucketUs = 1000L)
      .select("k", "overlap_us").collect().map(x => (x.getString(0), x.getLong(1)))
    assert(got.toSeq === Seq(("k1", 10L)))
  }

  test("intervalJoin touch-at-boundary counts as overlap (inclusive ends)") {
    import spark.implicits._
    val l = Seq((1L, 0L, 100L)).toDF("lid", "ls", "le")
    val r = Seq((2L, 100L, 200L)).toDF("rid", "rs", "re")
    val got = Temporal.intervalJoin(l, r, Nil, "ls", "le", "rs", "re", 64L)
      .select("overlap_us").collect().map(_.getLong(0))
    assert(got.toSeq === Seq(0L))
  }
}
