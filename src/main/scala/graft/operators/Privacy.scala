package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Privacy-risk audits for training corpora: k-anonymity and
  * l-diversity censuses over quasi-identifier (QI) tuples.
  *
  * A record is k-anonymous when at least k−1 other records share its
  * QI tuple (its *equivalence class*); an equivalence class is
  * l-diverse when it contains ≥ l distinct values of the sensitive
  * attribute. Releasing (or training on) records from small or
  * mono-sensitive classes is the standard re-identification /
  * attribute-disclosure risk a corpus audit must surface before the
  * data ships — the same census a Mondrian-style generalizer would
  * consume to decide what to coarsen.
  *
  * Scale shape: one keyed aggregation corpus → class relation (bounded
  * by the number of DISTINCT QI tuples, not the corpus), then one
  * keyed aggregation over that class relation. No windows, no joins,
  * no driver state; the only distinct-agg is per-class sensitive
  * cardinality, which Spark plans as a single scan with Expand
  * (rows ×2) — mergeable and partial-aggregated map-side.
  */
object Privacy {

  /** One row per distinct QI tuple: its size and the number of
    * distinct sensitive values inside it.
    */
  def classCensus(df: DataFrame, qiCols: Seq[String], sensCol: String): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("class_size"),
        countDistinct(sensCol).as("n_sensitive"))

  /** Per-`groupCol` k-anonymity report. QI classes are formed WITHIN
    * each group (the group is itself part of the quasi-identifier —
    * the usual per-cohort audit shape).
    *
    * Output columns per group: `n_records`, `n_classes`,
    * `min_class_size`, one `records_lt_<k>` per requested k (records
    * living in classes smaller than k — the at-risk population),
    * `mono_classes` (classes with a single sensitive value — the
    * l-diversity failures at l=2), and `risk_checksum` — an exact
    * membership checksum (md5-prefix bucket of the class key) over the
    * classes smaller than `riskK`, so two runs agreeing on COUNTS but
    * flagging different classes cannot both pass a gate.
    */
  def kAnonymity(
      df: DataFrame,
      groupCol: String,
      qiCols: Seq[String],
      sensCol: String,
      ks: Seq[Int] = Seq(2, 5, 10),
      riskK: Int = 5): DataFrame = {
    require(ks.nonEmpty, "kAnonymity: at least one k required")
    val census = classCensus(df, groupCol +: qiCols, sensCol)
    // NULL QI values form their own class upstream (groupBy keeps
    // them), so the checksum key must keep them distinct too:
    // concat_ws SKIPS nulls, which would both collide a (null, x)
    // class with a ("", x)-shaped one and diverge from any oracle
    // whose `||` propagates NULL. A NUL sentinel cannot collide with
    // real values (parquet strings are NUL-free in practice) and is
    // reproducible on the SQL side as chr(0).
    val classKey = concat_ws(":",
      qiCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    val perK: Seq[Column] = ks.map(k =>
      sum(when(col("class_size") < k, col("class_size")).otherwise(0L))
        .cast("long").as(s"records_lt_$k"))
    val aggs: Seq[Column] = Seq(
      sum("class_size").cast("long").as("n_records"),
      count(lit(1)).as("n_classes"),
      min("class_size").cast("long").as("min_class_size")) ++ perK ++ Seq(
      sum(when(col("n_sensitive") === 1, 1L).otherwise(0L))
        .cast("long").as("mono_classes"),
      sum(when(col("class_size") < riskK, Curation.hashBucket(classKey))
        .otherwise(0L)).cast("long").as("risk_checksum"))
    census
      .groupBy(groupCol)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** k-anonymity by SUPPRESSION: drop every record whose equivalence
    * class (groupCol + qiCols, NULLs grouping together) has fewer
    * than k members. One window count over the class key — a single
    * shuffle, no census join, no driver state; the window partition
    * is the equivalence class itself, so partitions are at most the
    * largest class (the quantity k-anonymity is ABOUT — never skewed
    * toward a scan-sized partition unless the data is one class, in
    * which case nothing is suppressed anyway).
    */
  def suppress(df: DataFrame, groupCol: String, qiCols: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"suppress: k must be >= 1, got $k")
    require(!df.columns.contains("_class_size"),
      "suppress: input already has a _class_size column")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy((groupCol +: qiCols).map(col): _*)
    df.withColumn("_class_size", count(lit(1)).over(w))
      .filter(col("_class_size") >= k)
      .drop("_class_size")
  }

  /** k-anonymity by BOTTOM-UP GENERALIZATION (local recoding with a
    * sound cascade) over a ladder of QI prefixes: level 0 keeps all
    * of `qiCols`, level l drops the LAST l columns (coarsening
    * ladder: the caller orders qiCols from coarse to fine), level
    * `qiCols.size` keeps only the cohort.
    *
    * Soundness: classes reaching k at level l are RELEASED there and
    * removed before level l+1 sizes are computed over the REMAINDER.
    * Counting coarser levels over the full population instead (the
    * naive reading of "finest level reaching k") is NOT k-anonymous:
    * a 2-record class inside a 7-record level-1 prefix would release
    * at level 1 because the prefix counts 7 — but 5 of those 7 are
    * released at level 0 showing their full QI, so an adversary who
    * knows the target's fine QI excludes them and the published
    * anonymity set is 2. In the cascade, a record's anonymity set is
    * exactly the records released WITH ITS DISPLAYED QI, and every
    * released set has ≥ k members; records whose remainder never
    * reaches k even at the cohort level carry `suppressed` = true
    * (release them only by dropping, as [[suppress]] does).
    *
    * Scale shape: the corpus is scanned twice and SHUFFLED never —
    * the level-0 census is one map-side-combined groupBy (only
    * census-sized partials move), the cascade is a chain of
    * CONDITIONAL window sums over the QI-bounded census itself
    * (remaining-mass at level l = Σ _n_l0 over still-sub-k classes
    * in the level-l prefix; a rollup over the corpus would re-scan
    * and re-shuffle it once per referenced level — measured: 3
    * Expand+Exchange corpus subtrees), and the single enriched
    * census broadcasts back onto the corpus in ONE join. Null QI
    * values participate via null-safe equality (`<=>`), matching the
    * census's groupBy semantics.
    */
  def generalize(df: DataFrame, groupCol: String, qiCols: Seq[String], k: Int): DataFrame = {
    require(qiCols.nonEmpty, "generalize: at least one QI column required")
    require(k >= 1, s"generalize: k must be >= 1, got $k")
    Seq("gen_level", "suppressed").foreach(c =>
      require(!df.columns.contains(c),
        s"generalize: input already has a $c column"))
    val ladder = groupCol +: qiCols
    val c0 = df.groupBy(ladder.map(col): _*).agg(count(lit(1)).as("_n_l0"))
    // _rem_l = mass still unreleased entering level l's prefix;
    // a class is still sub-k after level l iff every _rem_j (j <= l)
    // it has seen was < k
    def stillSub(l: Int): Column =
      (0 to l).map(j => col(s"_rem_l$j") < k).reduce(_ && _)
    val enriched = (1 to qiCols.size).foldLeft(
      c0.withColumn("_rem_l0", col("_n_l0"))) { (acc, l) =>
      val keep = ladder.dropRight(l)
      acc.withColumn(s"_rem_l$l",
        sum(when(stillSub(l - 1), col("_n_l0")).otherwise(0L)).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(keep.map(col): _*)))
    }
    val key = enriched
      .select(ladder.map(c => col(c).as(s"_k$c"))
        ++ (0 to qiCols.size).map(l => col(s"_rem_l$l")): _*)
    val joined = df.join(
      broadcast(key),
      ladder.map(c => df(c) <=> key(s"_k$c")).reduce(_ && _),
      "left")
      .drop(ladder.map(c => s"_k$c"): _*)
    // released at the first level whose REMAINDER mass reaches k
    val level = (0 until qiCols.size).foldRight(lit(qiCols.size): Column) {
      (l, rest) => when(col(s"_rem_l$l") >= k, l).otherwise(rest)
    }
    joined
      .withColumn("gen_level", level)
      .withColumn("suppressed", stillSub(qiCols.size))
      .drop((0 to qiCols.size).map(l => s"_rem_l$l"): _*)
  }
}
