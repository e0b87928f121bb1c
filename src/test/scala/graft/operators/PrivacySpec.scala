package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class PrivacySpec extends AnyFunSuite with SparkTestBase {

  /** 8 records, one cohort, QI = (src, band):
    *   class (web, 0): rows 1,2,3,4,5 — size 5, sens {0,1}
    *   class (web, 1): rows 6,7      — size 2, sens {2}   (mono)
    *   class (lib, 0): row 8         — size 1, sens {0}   (mono)
    */
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "en", "web", 0L, 0L), (2L, "en", "web", 0L, 1L),
      (3L, "en", "web", 0L, 0L), (4L, "en", "web", 0L, 1L),
      (5L, "en", "web", 0L, 0L),
      (6L, "en", "web", 1L, 2L), (7L, "en", "web", 1L, 2L),
      (8L, "en", "lib", 0L, 0L)
    ).toDF("id", "lang", "src", "band", "sens")
  }

  test("classCensus: one row per QI tuple with size and sensitive cardinality") {
    val got = Privacy.classCensus(corpus, Seq("src", "band"), "sens")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == Map(
      ("web", 0L) -> ((5L, 2L)),
      ("web", 1L) -> ((2L, 1L)),
      ("lib", 0L) -> ((1L, 1L))))
  }

  test("kAnonymity: at-risk populations, mono classes, and membership checksum") {
    val row = Privacy.kAnonymity(
      corpus, "lang", Seq("src", "band"), "sens",
      ks = Seq(2, 5, 10), riskK = 5).collect()
    assert(row.length == 1)
    val r = row.head
    assert(r.getAs[Long]("n_records") == 8L)
    assert(r.getAs[Long]("n_classes") == 3L)
    assert(r.getAs[Long]("min_class_size") == 1L)
    // k=2: only the singleton class is sub-k -> 1 record at risk
    assert(r.getAs[Long]("records_lt_2") == 1L)
    // k=5: singleton + pair -> 3 records at risk
    assert(r.getAs[Long]("records_lt_5") == 3L)
    // k=10: everything -> 8
    assert(r.getAs[Long]("records_lt_10") == 8L)
    // l-diversity failures at l=2: (web,1) and (lib,0)
    assert(r.getAs[Long]("mono_classes") == 2L)
    // checksum = exact membership of the sub-riskK classes, keyed by
    // the ':'-joined QI string — recompute independently
    val expected = Seq("web:1", "lib:0").map(md5Bucket).sum
    assert(r.getAs[Long]("risk_checksum") == expected)
  }

  test("kAnonymity: null QI values form their own class on the Spark side") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", Some("web"), 0L, 0L),
      (2L, "en", None: Option[String], 0L, 1L),
      (3L, "en", None: Option[String], 0L, 1L)
    ).toDF("id", "lang", "src", "band", "sens")
    val r = Privacy.kAnonymity(
      df, "lang", Seq("src", "band"), "sens").collect().head
    // 2 classes: (web,0) size 1 and (null,0) size 2 — null grouped, not dropped
    assert(r.getAs[Long]("n_classes") == 2L)
    assert(r.getAs[Long]("n_records") == 3L)
    assert(r.getAs[Long]("records_lt_2") == 1L)
    // both classes are sub-riskK; the null QI keys via the NUL
    // sentinel (concat_ws would otherwise SKIP it, colliding the
    // (null,0) class key with a bare "0" and diverging from an
    // oracle whose || propagates NULL)
    val expected = Seq("web:0", "\u0000:0").map(md5Bucket).sum
    assert(r.getAs[Long]("risk_checksum") == expected)
  }

  test("suppress drops exactly the records in sub-k classes") {
    val kept = Privacy.suppress(corpus, "lang", Seq("src", "band"), k = 3)
      .select("id").collect().map(_.getLong(0)).sorted
    // only class (web,0) with size 5 survives k=3
    assert(kept.sameElements(Array(1L, 2L, 3L, 4L, 5L)))
    // k=1 keeps everything; k=2 drops only the singleton
    assert(Privacy.suppress(corpus, "lang", Seq("src", "band"), k = 1).count() == 8L)
    assert(Privacy.suppress(corpus, "lang", Seq("src", "band"), k = 2).count() == 7L)
  }

  test("suppress groups null QI values as their own class") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", Some("web")), (2L, "en", None: Option[String]),
      (3L, "en", None: Option[String])
    ).toDF("id", "lang", "src")
    val kept = Privacy.suppress(df, "lang", Seq("src"), k = 2)
      .select("id").collect().map(_.getLong(0)).sorted
    // the (null) class has size 2 and survives; the web singleton drops
    assert(kept.sameElements(Array(2L, 3L)))
  }

  test("generalize cascade: released classes leave the remainder pool") {
    // corpus classes at level 0: (web,0)x5, (web,1)x2, (lib,0)x1.
    // (web,0) releases at level 0. The naive full-population count
    // would release (web,1) at level 1 because web=7 >= 5 — but 5 of
    // those 7 records are PUBLISHED with their full QI, so the true
    // anonymity set of a (web,*) record is only the remainder {6,7}
    // (+{8} at the cohort level) — sub-k, must be suppressed.
    val got = Privacy.generalize(corpus, "lang", Seq("src", "band"), k = 5)
      .select("id", "gen_level", "suppressed").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert((1L to 5L).forall(got(_) == ((0, false))))
    assert((6L to 8L).forall(got(_) == ((2, true))))
  }

  test("generalize releases at level 1 when the REMAINDER reaches k") {
    import spark.implicits._
    // (web,0)x5 releases at 0; (web,1)x3 and (web,2)x3 are each
    // sub-k but their remainder under (en, web) is 6 >= 5 — released
    // together at level 1, a genuine 6-member anonymity set
    val df = ((1L to 5L).map(i => (i, "en", "web", 0L)) ++
      (6L to 8L).map(i => (i, "en", "web", 1L)) ++
      (9L to 11L).map(i => (i, "en", "web", 2L))).toDF("id", "lang", "src", "band")
    val got = Privacy.generalize(df, "lang", Seq("src", "band"), k = 5)
      .select("id", "gen_level", "suppressed").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getBoolean(2)))).toMap
    assert((1L to 5L).forall(got(_) == ((0, false))))
    assert((6L to 11L).forall(got(_) == ((1, false))))
  }

  test("generalize: every released (non-suppressed) display group has >= k members") {
    import spark.implicits._
    // randomized class structure; assert the k-anonymity INVARIANT on
    // the released table: group records by what they DISPLAY (QI
    // coarsened to their assigned level) — every non-suppressed
    // display group must have >= k members
    val rnd = new scala.util.Random(31)
    val df = (1L to 300L).map { i =>
      (i, s"l${rnd.nextInt(3)}", s"s${rnd.nextInt(4)}", rnd.nextInt(6).toLong)
    }.toDF("id", "lang", "src", "band")
    val k = 7
    val out = Privacy.generalize(df, "lang", Seq("src", "band"), k)
      .withColumn("disp_src", when(col("gen_level") <= 1, col("src")))
      .withColumn("disp_band", when(col("gen_level") === 0, col("band")))
      .filter(!col("suppressed"))
      .groupBy("lang", "gen_level", "disp_src", "disp_band")
      .agg(count(lit(1)).as("n"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("n") >= k),
      out.filter(_.getAs[Long]("n") < k).mkString(","))
  }

  test("generalize flags suppression when even the cohort is sub-k") {
    import spark.implicits._
    val df = Seq(
      (1L, "xx", "web", 0L), (2L, "xx", "web", 1L)
    ).toDF("id", "lang", "src", "band")
    val got = Privacy.generalize(df, "lang", Seq("src", "band"), k = 5)
      .select("gen_level", "suppressed").collect()
    assert(got.forall(r => r.getInt(0) == 2 && r.getBoolean(1)))
  }

  test("generalize joins null QI classes null-safely (no dropped rows)") {
    import spark.implicits._
    val df = Seq(
      (1L, "en", None: Option[String], 0L), (2L, "en", None: Option[String], 0L),
      (3L, "en", Some("web"), 0L)
    ).toDF("id", "lang", "src", "band")
    val out = Privacy.generalize(df, "lang", Seq("src", "band"), k = 2)
    assert(out.count() == 3L) // left joins + <=> keep every record exactly once
    val got = out.select("id", "gen_level").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // (null,0) size 2 -> level 0; web singleton -> src level web=1 -> cohort=3 -> level 2
    assert(got(1L) == 0 && got(2L) == 0 && got(3L) == 2)
  }

  private def md5Bucket(key: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(key.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 7), 16)

  test("kAnonymity on a fully k-anonymous cohort reports zero risk") {
    import spark.implicits._
    val df = (0L until 20L).map(i =>
      (i, "de", "web", i % 2, i % 3)).toDF("id", "lang", "src", "band", "sens")
    val r = Privacy.kAnonymity(
      df, "lang", Seq("src", "band"), "sens").collect().head
    assert(r.getAs[Long]("min_class_size") == 10L)
    assert(r.getAs[Long]("records_lt_10") == 0L)
    assert(r.getAs[Long]("mono_classes") == 0L)
    assert(r.getAs[Long]("risk_checksum") == 0L)
  }
}
