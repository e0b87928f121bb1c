package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Robust}

/** Gate queries for the dataset-audit extension family: annotator
  * agreement (Cohen's kappa), label-balance census (Gini impurity),
  * robust length-outlier detection (exact median/MAD), web-corpus
  * URL provenance, and the k-anonymity / l-diversity privacy family
  * (census, suppression, generalization ladder). House rules throughout: every ratio ships as an
  * integer-unit projection, and any product that could exceed long
  * range at cluster-scale group sizes is widened to DECIMAL(38,0) on
  * the Spark side and HUGEINT in the oracle BEFORE multiplying — the
  * arithmetic stays exact at any n, and truncating `div`/`//` agree
  * between the engines (both round toward zero).
  */
object AuditOps {
  import Tables._
  import graft.operators.Expectations
  import graft.operators.Expectations.{Complete, Satisfies, Unique}

  /** THE documents-table constraint suite — shared verbatim by the
    * batch gate (q_expectations) and the streaming parity gate
    * (q_expectations_stream), which must answer the identical
    * question.
    */
  private[queries] val DocExpectations = Seq(
    Complete("text_complete", "text"),
    Complete("lang_complete", "lang"),
    Unique("doc_id_unique", "doc_id"),
    Satisfies("chars_in_range", col("n_chars").between(50, 500),
      thresholdX1e6 = 900000L),
    Satisfies("lang_in_set", col("lang").isin("en", "de", "fr"),
      thresholdX1e6 = 500000L),
    // deliberately strict: pins the passed=false path
    Satisfies("short_docs", col("n_chars") <= 100,
      thresholdX1e6 = 900000L))

  /** Oracle for [[DocExpectations]] — shared verbatim by the batch and
    * streaming parity gates (the streaming accumulator must answer the
    * identical question, so it gets the identical ground truth).
    */
  private[queries] val ExpectationsOracle =
    """WITH g AS (
      |  SELECT count(*) AS n,
      |         CAST(sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_text,
      |         CAST(sum(CASE WHEN lang IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_lang,
      |         CAST(count(DISTINCT doc_id) AS BIGINT) AS m_uniq,
      |         CAST(sum(CASE WHEN n_chars BETWEEN 50 AND 500 THEN 1 ELSE 0 END) AS BIGINT) AS m_range,
      |         CAST(sum(CASE WHEN lang IN ('en','de','fr') THEN 1 ELSE 0 END) AS BIGINT) AS m_set,
      |         CAST(sum(CASE WHEN n_chars <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS m_short
      |  FROM documents),
      |rows_out AS (
      |  SELECT 'text_complete' AS expectation, m_text AS m, CAST(1000000 AS BIGINT) AS threshold_x1e6 FROM g
      |  UNION ALL SELECT 'lang_complete', m_lang, 1000000 FROM g
      |  UNION ALL SELECT 'doc_id_unique', m_uniq, 1000000 FROM g
      |  UNION ALL SELECT 'chars_in_range', m_range, 900000 FROM g
      |  UNION ALL SELECT 'lang_in_set', m_set, 500000 FROM g
      |  UNION ALL SELECT 'short_docs', m_short, 900000 FROM g)
      |SELECT expectation,
      |       CASE WHEN g.n = 0 THEN NULL
      |            ELSE CAST((CAST(m AS HUGEINT) * 1000000) // g.n AS BIGINT) END AS metric_x1e6,
      |       threshold_x1e6,
      |       coalesce(CASE WHEN g.n = 0 THEN NULL
      |                     ELSE CAST((CAST(m AS HUGEINT) * 1000000) // g.n AS BIGINT) END
      |                >= threshold_x1e6, false) AS passed
      |FROM rows_out, g
      |ORDER BY expectation""".stripMargin

  val queries: Seq[GateQuery] = Seq(

    // Deequ-style declarative expectations in ONE aggregation pass:
    // six constraints (completeness, key uniqueness, range/set/length
    // compliance, one deliberately failing) compile into a single
    // agg(...) — one scan + one 1-row exchange for any number of
    // constraints — then unpivot via stack (a projection). Metrics are
    // integral parts-per-million; the oracle re-derives every cell
    // from scalar SQL aggregates.
    GateQuery(
      "q_expectations",
      (s, d) =>
        Expectations.audit(documents(s, d), DocExpectations)
          .orderBy("expectation"),
      Some(ExpectationsOracle)),

    // Exact minority-class rebalance: every language downsampled to
    // the smallest language's count, survivors decided by content-hash
    // rank (retry/layout-stable). The census pins the equal-size
    // invariant (n_kept identical across classes) AND exact membership
    // via id checksum; the oracle re-derives the same rank in SQL.
    GateQuery(
      "q_class_rebalance",
      (s, d) =>
        graft.operators.Curation.rebalanceClasses(
          documents(s, d), "doc_id", "lang", seed = 7L)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_kept"),
            sum(graft.operators.Curation.hashBucket(
              col("doc_id").cast("string"))).cast("long").as("id_checksum"),
            min("n_chars").as("min_chars"),
            max("n_chars").as("max_chars"))
          .orderBy("lang"),
      Some(s"""WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
              |m AS (SELECT min(cnt) AS mn FROM c),
              |r AS (SELECT lang, doc_id, n_chars,
              |             row_number() OVER (PARTITION BY lang ORDER BY
              |               ${SharedOracles.bucketSql("'rebal:7:' || lang || ':' || CAST(doc_id AS VARCHAR)")},
              |               doc_id) AS rn
              |      FROM documents)
              |SELECT lang, count(*) AS n_kept,
              |       CAST(sum(${SharedOracles.bucketSql("CAST(doc_id AS VARCHAR)")}) AS BIGINT) AS id_checksum,
              |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
              |FROM r, m WHERE rn <= mn
              |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Inter-annotator agreement on a labeled corpus: two deterministic
    // annotators (content-hash labels; annotator 2 flips annotator 1's
    // call on a planted 20% hash slice), then per-language Cohen's
    // kappa from the EXACT integer identity
    //   kappa = (a·n − S) / (n² − S),  S = r1·c1 + r0·c0
    // — numerator and denominator are pure counts, so the only
    // division is the final ×1e6 integral one. Widened to decimal so
    // a·n and n² stay exact for groups of any size. One shuffle.
    GateQuery(
      "q_cohen_kappa",
      (s, d) =>
        documents(s, d)
          .withColumn("a1",
            pmod(Curation.hashBucket(
              concat(lit("a1:"), col("doc_id").cast("string"))), lit(2)))
          .withColumn("a2",
            when(pmod(Curation.hashBucket(
              concat(lit("flip:"), col("doc_id").cast("string"))), lit(5)) === 0,
              lit(1L) - col("a1")).otherwise(col("a1")))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n"),
            sum(when(col("a1") === col("a2"), 1L).otherwise(0L)).as("n_agree"),
            sum("a1").cast("long").as("n_pos_a1"),
            sum("a2").cast("long").as("n_pos_a2"))
          .withColumn("_s",
            expr("CAST(n_pos_a1 AS DECIMAL(38,0)) * n_pos_a2" +
              " + (CAST(n AS DECIMAL(38,0)) - n_pos_a1) * (n - n_pos_a2)"))
          .withColumn("kappa_x1e6",
            expr("CASE WHEN CAST(n AS DECIMAL(38,0)) * n - _s = 0 THEN NULL" +
              " ELSE CAST((CAST(n_agree AS DECIMAL(38,0)) * n - _s) * 1000000" +
              " div (CAST(n AS DECIMAL(38,0)) * n - _s) AS BIGINT) END"))
          .select("lang", "n", "n_agree", "n_pos_a1", "n_pos_a2", "kappa_x1e6")
          .orderBy("lang"),
      Some(s"""WITH lab AS (
              |  SELECT lang,
              |         ${SharedOracles.bucketSql("'a1:' || CAST(doc_id AS VARCHAR)")} % 2 AS a1,
              |         ${SharedOracles.bucketSql("'flip:' || CAST(doc_id AS VARCHAR)")} % 5 AS f
              |  FROM documents),
              |lab2 AS (SELECT lang, a1,
              |                CASE WHEN f = 0 THEN 1 - a1 ELSE a1 END AS a2
              |         FROM lab),
              |g AS (SELECT lang, count(*) AS n,
              |             CAST(sum(CASE WHEN a1 = a2 THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
              |             CAST(sum(a1) AS BIGINT) AS n_pos_a1,
              |             CAST(sum(a2) AS BIGINT) AS n_pos_a2
              |      FROM lab2 GROUP BY lang),
              |k AS (SELECT *,
              |             CAST(n_pos_a1 AS HUGEINT) * n_pos_a2
              |               + (CAST(n AS HUGEINT) - n_pos_a1) * (n - n_pos_a2) AS s
              |      FROM g)
              |SELECT lang, n, n_agree, n_pos_a1, n_pos_a2,
              |       CASE WHEN CAST(n AS HUGEINT) * n - s = 0 THEN NULL
              |            ELSE CAST((CAST(n_agree AS HUGEINT) * n - s) * 1000000
              |                      // (CAST(n AS HUGEINT) * n - s) AS BIGINT) END AS kappa_x1e6
              |FROM k ORDER BY lang""".stripMargin)),

    // Label-balance census per source: Gini impurity and majority
    // share of the language distribution, from the exact identity
    //   gini = (n² − Σcᵢ²) / n²
    // over the (source, lang) count relation — two keyed aggs, the
    // second over a classes-sized relation. Same decimal widening.
    GateQuery(
      "q_gini_label_balance",
      (s, d) =>
        documents(s, d)
          .groupBy("source", "lang")
          .agg(count(lit(1)).as("_c"))
          .groupBy("source")
          .agg(
            sum("_c").cast("long").as("n_docs"),
            count(lit(1)).as("n_classes"),
            sum(expr("CAST(_c AS DECIMAL(38,0)) * _c")).as("_sq"),
            max("_c").cast("long").as("_maxc"))
          .withColumn("gini_x1e6",
            expr("CAST(((CAST(n_docs AS DECIMAL(38,0)) * n_docs - _sq) * 1000000)" +
              " div (CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)"))
          .withColumn("majority_x1e6",
            expr("CAST((CAST(_maxc AS DECIMAL(38,0)) * 1000000)" +
              " div n_docs AS BIGINT)"))
          .select("source", "n_docs", "n_classes", "gini_x1e6", "majority_x1e6")
          .orderBy("source"),
      Some("""WITH c AS (SELECT source, lang, count(*) AS c
             |           FROM documents GROUP BY source, lang),
             |g AS (SELECT source,
             |             CAST(sum(c) AS BIGINT) AS n_docs,
             |             count(*) AS n_classes,
             |             sum(CAST(c AS HUGEINT) * c) AS sq,
             |             CAST(max(c) AS BIGINT) AS maxc
             |      FROM c GROUP BY source)
             |SELECT source, n_docs, n_classes,
             |       CAST(((CAST(n_docs AS HUGEINT) * n_docs - sq) * 1000000)
             |            // (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT) AS gini_x1e6,
             |       CAST((CAST(maxc AS HUGEINT) * 1000000) // n_docs AS BIGINT) AS majority_x1e6
             |FROM g ORDER BY source""".stripMargin)),

    // Robust length-outlier detection per language: exact lower
    // median + MAD over n_chars via Robust.madOutliers — the Spark
    // side derives both medians from distinct-value HISTOGRAMS (the
    // only windows are histogram-sized), while the oracle is the
    // PLAIN row_number-window derivation, so the gate proves the
    // scale-correct plan reproduces textbook rank semantics. Census
    // pins the medians, MADs, outlier counts, and exact outlier
    // membership (id checksum).
    GateQuery(
      "q_length_outliers",
      (s, d) =>
        Robust.madOutliers(documents(s, d), "lang", "n_chars", k = 3)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            max("median").as("median_chars"),
            max("mad").as("mad_chars"),
            sum(when(col("is_outlier"), 1L).otherwise(0L)).as("n_outliers"),
            sum(when(col("is_outlier"),
              Curation.hashBucket(col("doc_id").cast("string")))
              .otherwise(0L)).cast("long").as("outlier_checksum"))
          .orderBy("lang"),
      Some(s"""WITH ranked AS (
              |  SELECT lang, doc_id, n_chars,
              |         row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS rn,
              |         count(*) OVER (PARTITION BY lang) AS n
              |  FROM documents),
              |med AS (SELECT lang, n_chars AS med FROM ranked WHERE rn = (n + 1) // 2),
              |dev AS (SELECT d.lang, d.doc_id, m.med,
              |               abs(d.n_chars - m.med) AS dv
              |        FROM documents d JOIN med m ON d.lang = m.lang),
              |rdev AS (SELECT lang, doc_id, dv,
              |                row_number() OVER (PARTITION BY lang ORDER BY dv, doc_id) AS rn,
              |                count(*) OVER (PARTITION BY lang) AS n
              |         FROM dev),
              |mad AS (SELECT lang, dv AS mad FROM rdev WHERE rn = (n + 1) // 2)
              |SELECT dev.lang, count(*) AS n_docs,
              |       CAST(max(med) AS BIGINT) AS median_chars,
              |       CAST(max(mad.mad) AS BIGINT) AS mad_chars,
              |       CAST(sum(CASE WHEN dv > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
              |       CAST(sum(CASE WHEN dv > 3 * mad.mad
              |                     THEN ${SharedOracles.bucketSql("CAST(doc_id AS VARCHAR)")}
              |                     ELSE 0 END) AS BIGINT) AS outlier_checksum
              |FROM dev JOIN mad ON dev.lang = mad.lang
              |GROUP BY dev.lang ORDER BY dev.lang""".stripMargin)),

    // Web-corpus URL provenance: a deterministic URL per document
    // (host fans out over lang × residues, path depth varies by id),
    // then pure STRUCTURAL parsing — split on '/' and '.', negative
    // indexing for the registered domain — and a per-registered-domain
    // census (docs, distinct hosts, path-depth mass, membership
    // checksum). No regex anywhere: split-on-literal behaves
    // identically in Java and RE2-family engines, which regex '.'
    // classes do not. One explode-free scan + one keyed agg.
    GateQuery(
      "q_url_extract",
      (s, d) =>
        documents(s, d)
          .withColumn("url",
            concat(lit("https://"), col("lang"), col("doc_id") % 7,
              lit(".example"), col("doc_id") % 3, lit(".com/"),
              col("source"), lit("/"),
              expr("repeat('p/', CAST(doc_id % 3 AS INT))"),
              col("doc_id")))
          .withColumn("_parts", split(col("url"), "/"))
          .withColumn("host", element_at(col("_parts"), 3))
          .withColumn("_hs", split(col("host"), "\\."))
          .withColumn("reg_domain",
            concat(element_at(col("_hs"), -2), lit("."),
              element_at(col("_hs"), -1)))
          .withColumn("depth", (size(col("_parts")) - 3).cast("long"))
          .groupBy("reg_domain")
          .agg(
            count(lit(1)).as("n_docs"),
            countDistinct("host").as("n_hosts"),
            sum("depth").cast("long").as("sum_depth"),
            sum(Curation.hashBucket(col("doc_id").cast("string")))
              .cast("long").as("id_checksum"))
          .orderBy("reg_domain"),
      Some(s"""WITH u AS (
              |  SELECT doc_id,
              |         'https://' || lang || CAST(doc_id % 7 AS VARCHAR)
              |           || '.example' || CAST(doc_id % 3 AS VARCHAR) || '.com/'
              |           || source || '/'
              |           || repeat('p/', CAST(doc_id % 3 AS INT))
              |           || CAST(doc_id AS VARCHAR) AS url
              |  FROM documents),
              |p AS (SELECT doc_id,
              |             string_split(url, '/') AS parts,
              |             string_split(url, '/')[3] AS host
              |      FROM u),
              |r AS (SELECT doc_id, host,
              |             string_split(host, '.')[-2] || '.' ||
              |             string_split(host, '.')[-1] AS reg_domain,
              |             CAST(len(parts) - 3 AS BIGINT) AS depth
              |      FROM p)
              |SELECT reg_domain, count(*) AS n_docs,
              |       count(DISTINCT host) AS n_hosts,
              |       CAST(sum(depth) AS BIGINT) AS sum_depth,
              |       CAST(sum(${SharedOracles.bucketSql("CAST(doc_id AS VARCHAR)")}) AS BIGINT) AS id_checksum
              |FROM r GROUP BY reg_domain ORDER BY reg_domain""".stripMargin)),

    // Label-noise detection via k-NN majority vote (Confident-
    // Learning-lite): each vector's 5 cosine-nearest neighbors vote;
    // a strict majority (≥3) disagreeing with the vector's own label
    // flags it. The Spark side rides the IVF topKJoin at nprobe = C
    // (exact; at corpus scale nprobe < C makes detection approximate,
    // which is fine for monitoring) and takes top-6-including-self
    // then drops self — the top-5 non-self under the shared total
    // order (cos desc, id asc) is always a subset of the top-6
    // overall, so this equals the oracle's exclude-self-first rank.
    // Every window after the k-NN join is ≤6 rows per query.
    GateQuery(
      "q_label_noise",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val e = fanOut(embeddings(s, d))  // 1-file scan feeds the all-pairs knn (Tables.fanOut doc)
          .withColumn("v", transform(col("embedding"), x => x.cast("double")))
        val cents = graft.operators.Ann.centroids(e, "v", "vec_id", 8)
        val lab = e.select(col("vec_id"), col("label"))
        val nn5 = graft.operators.Ann.topKJoin(
          e.select(col("vec_id"), col("v")), e.select(col("vec_id"), col("v")),
          "v", "vec_id", "vec_id", k = 6, cents, nprobe = 8)
          .filter(col("query_id") =!= col("vec_id"))
          .withColumn("_r",
            row_number().over(Window.partitionBy("query_id").orderBy("rank")))
          .filter(col("_r") <= 5)
        val maj = nn5
          .join(lab.select(col("vec_id"), col("label").as("n_label")), Seq("vec_id"))
          .groupBy("query_id", "n_label").agg(count(lit(1)).as("cnt"))
          .withColumn("_mr", row_number().over(
            Window.partitionBy("query_id").orderBy(desc("cnt"), asc("n_label"))))
          .filter(col("_mr") === 1)
          .select(col("query_id").as("vec_id"),
            col("n_label").as("maj_label"), col("cnt").as("maj_cnt"))
        maj.join(lab, Seq("vec_id"))
          .withColumn("is_noise",
            col("maj_label") =!= col("label") && col("maj_cnt") >= 3)
          .groupBy("label")
          .agg(
            count(lit(1)).as("n_vecs"),
            sum(when(col("is_noise"), 1L).otherwise(0L)).as("n_flagged"),
            sum(when(col("is_noise"),
              graft.operators.Curation.hashBucket(col("vec_id").cast("string")))
              .otherwise(0L)).cast("long").as("flagged_checksum"))
          .orderBy("label")
      },
      Some(s"""WITH e AS (
              |  SELECT vec_id, label,
              |         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
              |  FROM embeddings),
              |p AS (SELECT a.vec_id AS qid, b.vec_id AS nid, b.label AS n_label,
              |             round(
              |               list_sum(list_transform(list_zip(a.v, b.v),
              |                                       x -> struct_extract(x, 1) * struct_extract(x, 2)))
              |               / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
              |                  * sqrt(list_sum(list_transform(b.v, x -> x * x)))), 4) AS cos
              |      FROM e a JOIN e b ON a.vec_id <> b.vec_id),
              |r AS (SELECT *, row_number() OVER (PARTITION BY qid
              |                                   ORDER BY cos DESC, nid) AS rn
              |      FROM p),
              |v AS (SELECT qid, n_label, count(*) AS cnt
              |      FROM r WHERE rn <= 5 GROUP BY qid, n_label),
              |m AS (SELECT qid, n_label AS maj_label, cnt AS maj_cnt,
              |             row_number() OVER (PARTITION BY qid
              |                                ORDER BY cnt DESC, n_label) AS mr
              |      FROM v),
              |f AS (SELECT e.vec_id, e.label,
              |             (m.maj_label <> e.label AND m.maj_cnt >= 3) AS is_noise
              |      FROM e JOIN m ON m.qid = e.vec_id AND m.mr = 1)
              |SELECT label, count(*) AS n_vecs,
              |       CAST(sum(CASE WHEN is_noise THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
              |       CAST(sum(CASE WHEN is_noise
              |                     THEN ${SharedOracles.bucketSql("CAST(vec_id AS VARCHAR)")}
              |                     ELSE 0 END) AS BIGINT) AS flagged_checksum
              |FROM f GROUP BY label ORDER BY label""".stripMargin)),

    // Cross-split leakage census: near-duplicate pairs (exact-verified
    // Jaccard ≥ 0.9, the SAME LSH pipeline as the dedup gates) whose
    // endpoints land in DIFFERENT folds of the SAME content-hash
    // 5-fold split q_kfold_split assigns — the leakage a model
    // evaluated on fold i trained on fold j would exploit. Census per
    // unordered fold pair with exact pair-membership checksums.
    GateQuery(
      "q_split_leakage",
      (s, d) =>
        // the verified pair graph is the suite's ONE materialized
        // dedup product (ExtOps.cachedVerifiedPairs — the production
        // shape: downstream audits read the pair TABLE, they don't
        // re-run LSH); folds are a pure function of the ids already on
        // it — a projection, no second corpus scan, no joins
        ExtOps.cachedVerifiedPairs(s, d)
          .withColumn("fold_a", SharedOracles.foldCol(col("id_a")))
          .withColumn("fold_b", SharedOracles.foldCol(col("id_b")))
          .filter(col("fold_a") =!= col("fold_b"))
          .withColumn("fold_lo", least(col("fold_a"), col("fold_b")))
          .withColumn("fold_hi", greatest(col("fold_a"), col("fold_b")))
          .groupBy("fold_lo", "fold_hi")
          .agg(
            count(lit(1)).as("n_leaks"),
            sum(graft.operators.Curation.hashBucket(
              concat_ws(":", col("id_a"), col("id_b"))))
              .cast("long").as("pair_checksum"))
          .orderBy("fold_lo", "fold_hi"),
      Some(s"""WITH w AS (
              |  SELECT doc_id,
              |         list_distinct(string_split(trim(text), ' ')) AS wset,
              |         ${SharedOracles.foldSql("doc_id")} AS fold
              |  FROM documents),
              |pairs AS (
              |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              |         a.fold AS fold_a, b.fold AS fold_b
              |  FROM w a JOIN w b ON a.doc_id < b.doc_id
              |  WHERE CAST(len(list_intersect(a.wset, b.wset)) AS DOUBLE)
              |        / (len(a.wset) + len(b.wset) - len(list_intersect(a.wset, b.wset)))
              |        >= 0.9),
              |x AS (SELECT least(fold_a, fold_b) AS fold_lo,
              |             greatest(fold_a, fold_b) AS fold_hi,
              |             id_a, id_b
              |      FROM pairs WHERE fold_a <> fold_b)
              |SELECT fold_lo, fold_hi, count(*) AS n_leaks,
              |       CAST(sum(${SharedOracles.bucketSql("CAST(id_a AS VARCHAR) || ':' || CAST(id_b AS VARCHAR)")}) AS BIGINT) AS pair_checksum
              |FROM x GROUP BY fold_lo, fold_hi
              |ORDER BY fold_lo, fold_hi""".stripMargin)),

    // k-anonymity / l-diversity privacy census per language cohort:
    // QI = (source, 50-char length band), sensitive = a deterministic
    // content-hash label. Per cohort: the at-risk population under
    // k ∈ {2,5,10} (records in classes smaller than k), the
    // l-diversity failures at l=2 (mono-sensitive classes), and an
    // EXACT class-membership checksum over the sub-riskK classes — so
    // two runs agreeing on counts but flagging different classes
    // cannot both pass. Two keyed aggs; the second runs over the
    // distinct-QI-tuple relation, bounded regardless of corpus size.
    GateQuery(
      "q_k_anonymity",
      (s, d) =>
        graft.operators.Privacy.kAnonymity(
          documents(s, d)
            // `div`, not `/`: integer band math stays exact at any
            // n_chars; null length → its own '-1' band on both engines
            .withColumn("cb", coalesce(expr("n_chars div 50"), lit(-1L)))
            .withColumn("sens", pmod(Curation.hashBucket(
              concat(lit("sens:"), col("doc_id").cast("string"))), lit(3L))),
          groupCol = "lang", qiCols = Seq("source", "cb"), sensCol = "sens")
          .orderBy("lang"),
      Some(s"""WITH q AS (
              |  SELECT lang, source,
              |         coalesce(n_chars // 50, -1) AS cb,
              |         ${SharedOracles.bucketSql("'sens:' || CAST(doc_id AS VARCHAR)")} % 3 AS sens
              |  FROM documents),
              |c AS (SELECT lang, source, cb, count(*) AS cs,
              |             count(DISTINCT sens) AS ns
              |      FROM q GROUP BY lang, source, cb)
              |SELECT lang,
              |       CAST(sum(cs) AS BIGINT) AS n_records,
              |       count(*) AS n_classes,
              |       CAST(min(cs) AS BIGINT) AS min_class_size,
              |       CAST(sum(CASE WHEN cs < 2 THEN cs ELSE 0 END) AS BIGINT) AS records_lt_2,
              |       CAST(sum(CASE WHEN cs < 5 THEN cs ELSE 0 END) AS BIGINT) AS records_lt_5,
              |       CAST(sum(CASE WHEN cs < 10 THEN cs ELSE 0 END) AS BIGINT) AS records_lt_10,
              |       CAST(sum(CASE WHEN ns = 1 THEN 1 ELSE 0 END) AS BIGINT) AS mono_classes,
              |       CAST(sum(CASE WHEN cs < 5
              |                     THEN ${SharedOracles.bucketSql("coalesce(source, chr(0)) || ':' || CAST(cb AS VARCHAR)")}
              |                     ELSE 0 END) AS BIGINT) AS risk_checksum
              |FROM c GROUP BY lang ORDER BY lang""".stripMargin)),

    // k-anonymity ENFORCEMENT by suppression: drop every record in a
    // sub-k class (k=5), report per-cohort survivors plus an exact
    // survivor-membership checksum. Spark side is ONE window count
    // over the class key (the window partition IS the equivalence
    // class — bounded by the largest class, the quantity the audit is
    // about); the oracle re-derives via a window too but aggregates
    // with conditional sums instead of a filter.
    GateQuery(
      "q_k_suppress",
      (s, d) => {
        val base = documents(s, d)
          .withColumn("cb", coalesce(expr("n_chars div 50"), lit(-1L)))
        val kept = graft.operators.Privacy
          .suppress(base, "lang", Seq("source", "cb"), k = 5)
        // null-SAFE cohort join (<=>): a null-lang cohort must match
        // its own kept aggregate, mirroring the oracle's single-
        // relation GROUP BY (an equi-join would report it all-dropped)
        val keptAgg = kept.groupBy(col("lang").as("_lang")).agg(
          count(lit(1)).as("n_kept"),
          sum(Curation.hashBucket(col("doc_id").cast("string")))
            .cast("long").as("kept_checksum"))
        base.groupBy("lang").agg(count(lit(1)).as("n_records"))
          .join(keptAgg, col("lang") <=> col("_lang"), "left")
          .select(col("lang"), col("n_records"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            (col("n_records") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"),
            coalesce(col("kept_checksum"), lit(0L)).as("kept_checksum"))
          .orderBy("lang")
      },
      Some(s"""WITH q AS (
              |  SELECT lang, source, coalesce(n_chars // 50, -1) AS cb, doc_id
              |  FROM documents),
              |g AS (SELECT *, count(*) OVER (PARTITION BY lang, source, cb) AS cs
              |      FROM q)
              |SELECT lang, count(*) AS n_records,
              |       CAST(sum(CASE WHEN cs >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
              |       CAST(sum(CASE WHEN cs < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
              |       CAST(sum(CASE WHEN cs >= 5
              |                     THEN ${SharedOracles.bucketSql("CAST(doc_id AS VARCHAR)")}
              |                     ELSE 0 END) AS BIGINT) AS kept_checksum
              |FROM g GROUP BY lang ORDER BY lang""".stripMargin)),

    // k-anonymity ENFORCEMENT by bottom-up generalization over the
    // ladder (source, band) -> (source) -> (cohort only), with the
    // SOUND cascade: classes reaching k=5 at a level are released
    // there and removed before the next level's sizes are computed
    // over the remainder (counting coarser levels over the full
    // population would publish sub-k anonymity sets — see the
    // operator Scaladoc). Spark builds the level-0 census once
    // (map-side-combined groupBy), runs the cascade as conditional
    // window sums OVER THE CENSUS relation, and broadcasts the one
    // enriched census back — two corpus scans, zero corpus shuffles;
    // the oracle independently re-derives the cascade with layered
    // conditional window counts over the corpus. The checksum pins
    // the per-record LEVEL assignment, not just the counts.
    GateQuery(
      "q_k_generalize",
      (s, d) => {
        val base = documents(s, d)
          .withColumn("cb", coalesce(expr("n_chars div 50"), lit(-1L)))
        graft.operators.Privacy
          .generalize(base, "lang", Seq("source", "cb"), k = 5)
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_records"),
            sum(when(col("gen_level") === 0, 1L).otherwise(0L))
              .cast("long").as("n_l0"),
            sum(when(col("gen_level") === 1, 1L).otherwise(0L))
              .cast("long").as("n_l1"),
            sum(when(col("gen_level") === 2, 1L).otherwise(0L))
              .cast("long").as("n_l2"),
            sum(when(col("suppressed"), 1L).otherwise(0L))
              .cast("long").as("n_suppressed"),
            sum(Curation.hashBucket(concat(
              col("doc_id").cast("string"), lit(":"),
              col("gen_level").cast("string"))))
              .cast("long").as("level_checksum"))
          .orderBy("lang")
      },
      Some(s"""WITH q AS (
              |  SELECT lang, source, coalesce(n_chars // 50, -1) AS cb, doc_id
              |  FROM documents),
              |g AS (SELECT *,
              |        count(*) OVER (PARTITION BY lang, source, cb) AS n0
              |      FROM q),
              |g1 AS (SELECT *,
              |         sum(CASE WHEN n0 < 5 THEN 1 ELSE 0 END)
              |           OVER (PARTITION BY lang, source) AS r1
              |       FROM g),
              |g2 AS (SELECT *,
              |         sum(CASE WHEN n0 < 5 AND r1 < 5 THEN 1 ELSE 0 END)
              |           OVER (PARTITION BY lang) AS r2
              |       FROM g1),
              |lv AS (SELECT lang, doc_id,
              |              CASE WHEN n0 >= 5 THEN 0
              |                   WHEN r1 >= 5 THEN 1
              |                   ELSE 2 END AS lvl,
              |              CASE WHEN n0 < 5 AND r1 < 5 AND r2 < 5
              |                   THEN 1 ELSE 0 END AS sup
              |       FROM g2)
              |SELECT lang, count(*) AS n_records,
              |       CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_l0,
              |       CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_l1,
              |       CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_l2,
              |       CAST(sum(sup) AS BIGINT) AS n_suppressed,
              |       CAST(sum(${SharedOracles.bucketSql("CAST(doc_id AS VARCHAR) || ':' || CAST(lvl AS VARCHAR)")}) AS BIGINT) AS level_checksum
              |FROM lv GROUP BY lang ORDER BY lang""".stripMargin)))
}
