package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class CurationSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (0L, "grp_a", "the quick brown fox jumps over the lazy dog"),
    (1L, "grp_a", "the quick brown fox jumps over the lazy cat"),
    (2L, "grp_a", "one two three"),
    (3L, "grp_b", "alpha beta gamma delta epsilon zeta eta theta"),
    (4L, "grp_b", "totally unrelated words in this document here now"),
    (5L, "grp_b", "alpha beta gamma delta epsilon zeta eta iota")
  ).toDF("id", "grp", "text")

  // ---- stratifiedSample --------------------------------------------------

  test("stratifiedSample is deterministic and layout-independent") {
    val big = spark.range(0, 2000)
      .withColumn("grp", when(col("id") % 2 === 0, "even").otherwise("odd"))
    def ids(parts: Int): Set[Long] =
      Curation.stratifiedSample(big.repartition(parts), "id", "grp",
          Map("even" -> 0.1), 0.5)
        .select("id").as[Long].collect().toSet
    val a = ids(1)
    assert(a == ids(8), "sample must not depend on partition layout")
    // achieved rates near targets (md5 is uniform; 1000 draws each)
    val even = a.count(_ % 2 == 0).toDouble / 1000
    val odd  = a.count(_ % 2 == 1).toDouble / 1000
    assert(math.abs(even - 0.1) < 0.04, s"even rate $even")
    assert(math.abs(odd - 0.5) < 0.06, s"odd rate $odd")
  }

  test("stratifiedSample bucket matches a reference md5 computation") {
    // Curation.hashBucket must equal the first 7 hex chars of md5,
    // parsed base-16 — the exact quantity the DuckDB oracle computes.
    val got = docs.select(
      Curation.hashBucket(concat_ws(":", col("grp"), col("id").cast("string"))).as("b"),
      concat_ws(":", col("grp"), col("id").cast("string")).as("k"))
      .as[(Long, String)].collect()
    got.foreach { case (b, k) =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(k.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(b == java.lang.Long.parseLong(md.take(7), 16), k)
    }
  }

  test("sampleExactPerGroup: exactly n per group, layout-independent") {
    val big = spark.range(0, 300)
      .withColumn("grp", (col("id") % 3).cast("string"))
    def ids(parts: Int): Seq[Long] =
      Curation.sampleExactPerGroup(big.repartition(parts), "id", "grp", 10)
        .select("id").as[Long].collect().toSeq.sorted
    val a = ids(1)
    assert(a == ids(8))
    assert(a.size == 30)
    // exactly 10 per group
    (0 until 3).foreach { g =>
      assert(a.count(_ % 3 == g) == 10, s"group $g")
    }
  }

  // ---- packShards --------------------------------------------------------

  test("packShards: every non-final shard reaches the budget, order is stable") {
    val toks = docs.withColumn("n", size(split(col("text"), " ")))
    val packed = Curation.packShards(toks, "grp", "id", "n", 12L)
      .select("grp", "id", "n", "shard")
      .as[(String, Long, Int, Long)].collect().sortBy(r => (r._1, r._2))
    // shard ids are non-decreasing within a group and start at 0
    packed.groupBy(_._1).foreach { case (_, rows) =>
      val shards = rows.map(_._4)
      assert(shards.head == 0L)
      assert(shards.zip(shards.tail).forall { case (a, b) => a <= b })
      // the token-start offset of each row's shard matches the prefix sum
      var cum = 0L
      rows.foreach { case (_, _, n, shard) =>
        assert(shard == cum / 12L, s"row at cum=$cum")
        cum += n
      }
    }
    // layout independence
    val packed8 = Curation.packShards(toks.repartition(8), "grp", "id", "n", 12L)
      .select("grp", "id", "shard").as[(String, Long, Long)].collect().toSet
    assert(packed.map(r => (r._1, r._2, r._4)).toSet == packed8)
    // multi-column order: a tied leading column with a unique
    // tiebreak assigns shards layout-independently
    val tied = toks.withColumn("bucket", lit(1))
    val m1 = Curation.packShards(tied.repartition(1), "grp", Seq("bucket", "id"), "n", 12L)
      .select("grp", "id", "shard").as[(String, Long, Long)].collect().toSet
    val m8 = Curation.packShards(tied.repartition(8), "grp", Seq("bucket", "id"), "n", 12L)
      .select("grp", "id", "shard").as[(String, Long, Long)].collect().toSet
    assert(m1 == m8)
  }

  test("truncateToBudget caps tokens and preserves short docs verbatim") {
    val out = Curation.truncateToBudget(docs, "text", 5)
      .select("id", "text_trunc", "n_tokens_kept")
      .as[(Long, String, Int)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(0L) == (("the quick brown fox jumps", 5))) // 9 words -> 5
    assert(out(2L) == (("one two three", 3)))             // short: verbatim
  }

  // ---- shingles / decontaminate -----------------------------------------

  test("shingleHashes: n-gram count, distinctness, short-doc guard") {
    val sh = docs.select(col("id"),
      Curation.shingleHashes(col("text"), 5).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(0L).size == 5) // 9 words -> 5 shingles
    assert(sh(2L).isEmpty)   // 3 words < n
    assert(sh(0L).forall(_.length == 16))
    // doc 0 and 1 share the first 4 shingles (differ only in last word)
    assert(sh(0L).toSet.intersect(sh(1L).toSet).size == 4)
  }

  test("decontaminate flags docs sharing >= minHits shingles with eval") {
    val eval  = docs.filter(col("id") === 0L || col("id") === 3L)
    val train = docs.filter(col("id") =!= 0L && col("id") =!= 3L)
    val flagged = Curation.decontaminate(train, eval, "id", "text", n = 5, minHits = 2)
      .as[(Long, Long)].collect().toMap
    assert(flagged.keySet == Set(1L, 5L)) // near-dups of the eval docs
    assert(flagged(1L) == 4L) // 9-word docs: 5 shingles, 4 shared with doc 0
    assert(flagged(5L) == 3L) // 8-word docs: 4 shingles, 3 shared with doc 3
    // unrelated docs are not flagged even at minHits = 1
    val all = Curation.decontaminate(train, eval, "id", "text", n = 5, minHits = 1)
      .as[(Long, Long)].collect().toMap
    assert(!all.contains(4L))
  }

  // ---- redaction ---------------------------------------------------------

  test("weightedMix: integer epochs always emitted, fractional draws stable, zero removes") {
    val big = spark.range(0, 3000).toDF("id")
      .withColumn("grp",
        when(col("id") % 3 === 0, "up").when(col("id") % 3 === 1, "down").otherwise("gone"))
    def run(parts: Int) =
      Curation.weightedMix(big.repartition(parts), "id", "grp",
          Map("up" -> 2.5, "down" -> 0.25, "gone" -> 0.0))
        .select("id", "grp", "epoch").as[(Long, String, Int)].collect().toSet
    val out = run(1)
    assert(out == run(8), "mix must not depend on partition layout")
    // weight 0 erases the group
    assert(!out.exists(_._2 == "gone"))
    // up-weight 2.5: every doc appears 2 or 3 times (epochs 0..copies-1),
    // realized mean ≈ 2.5
    val upCounts = out.filter(_._2 == "up").groupBy(_._1).map(_._2.size).toSeq
    assert(upCounts.forall(c => c == 2 || c == 3))
    val upMean = upCounts.sum.toDouble / upCounts.size
    assert(math.abs(upMean - 2.5) < 0.1, s"realized up-weight $upMean")
    // epochs are contiguous from 0
    val epochsPerDoc = out.filter(_._2 == "up").groupBy(_._1).values
    assert(epochsPerDoc.forall(g => g.map(_._3).toSeq.sorted == (0 until g.size)))
    // down-weight 0.25: each doc 0 or 1 copies, rate ≈ 0.25
    val downDocs = out.filter(_._2 == "down")
    assert(downDocs.forall(_._3 == 0))
    val downRate = downDocs.size / 1000.0
    assert(math.abs(downRate - 0.25) < 0.06, s"realized down-weight $downRate")
  }

  test("temperatureMix: exact per-doc copies, alpha flattening, layout independence") {
    import spark.implicits._
    // sources: a = 80 docs, b = 20 docs (p = 0.8 / 0.2)
    val df = (0L until 100L).map(i => (i, if (i < 80) "a" else "b"))
      .toDF("id", "grp")
    def run(alpha: Double, target: Long, parts: Int = 1) =
      Curation.temperatureMix(df.repartition(parts), "id", "grp", alpha, target)
        .select("id", "grp", "epoch").as[(Long, String, Int)].collect().toSet
    // exact mirror of the operator arithmetic, md5 bucket included
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(grp: String, id: Long): Long = {
      val hex = md.digest(s"$grp:$id:tmix".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      java.lang.Long.parseLong(hex, 16)
    }
    def expected(alpha: Double, target: Long): Set[(Long, String, Int)] = {
      val n = Map("a" -> 80L, "b" -> 20L)
      val z = n.values.map(v => math.pow(v.toDouble, alpha)).sum
      (0L until 100L).flatMap { id =>
        val g = if (id < 80) "a" else "b"
        val w = target.toDouble * math.pow(n(g).toDouble, alpha) / z / n(g)
        val copies = w.toLong +
          (if (bucket(g, id) < (w - math.floor(w)) * (1L << 28)) 1 else 0)
        (0 until copies.toInt).map(e => (id, g, e))
      }.toSet
    }
    for (alpha <- Seq(0.0, 0.5, 1.0); target <- Seq(50L, 100L, 250L))
      assert(run(alpha, target) == expected(alpha, target),
        s"alpha=$alpha target=$target")
    // layout independence
    assert(run(0.5, 100L, parts = 7) == run(0.5, 100L))
    // alpha = 1 keeps the natural mix: uniform per-doc weight => the
    // realized source shares track the input shares
    val nat = run(1.0, 100L)
    assert(math.abs(nat.count(_._2 == "a").toDouble / nat.size - 0.8) < 0.05)
    // alpha = 0 flattens: each source targets the same row count
    val flat = run(0.0, 100L)
    val aN = flat.count(_._2 == "a"); val bN = flat.count(_._2 == "b")
    assert(math.abs(aN - bN) <= 10, s"alpha=0 shares a=$aN b=$bN")
    // b docs get guaranteed multi-copies at alpha=0 (w_b = 2.5)
    assert(flat.filter(_._2 == "b").groupBy(_._1).forall(_._2.size >= 2))
  }

  test("redact scrubs emails, phones, and long digit runs") {
    val pii = Seq(
      (0L, "contact bob.smith+x@example.co.uk or 555-123-4567 today"),
      (1L, "account 123456789 is fine but 12345 stays"),
      (2L, "clean text with no pii at all")
    ).toDF("id", "text")
    val red = pii.select(col("id"), Curation.redact(col("text"),
        Seq(Curation.EmailPattern, Curation.PhonePattern, Curation.LongDigitsPattern))
        .as("t"))
      .as[(Long, String)].collect().toMap
    assert(red(0L) == "contact <PII> or <PII> today")
    assert(red(1L) == "account <PII> is fine but 12345 stays")
    assert(red(2L) == "clean text with no pii at all")
    // census column agrees
    val counts = pii.select(col("id"),
        Curation.matchCount(col("text"), Curation.EmailPattern).as("e"))
      .as[(Long, Int)].collect().toMap
    assert(counts == Map(0L -> 1, 1L -> 0, 2L -> 0))
  }

  test("chunkDocuments: windows tile with exact overlap and reassemble losslessly") {
    import spark.implicits._
    val texts = Seq(
      "a" * 5, // shorter than one window
      (0 until 300).map(i => ('a' + i % 26).toChar).mkString, // several windows + partial tail
      "x" * 96, // exactly one stride
      "y" * 128) // exactly one window
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val size = 128
    val overlap = 32
    val stride = size - overlap
    val chunks = Curation.chunkDocuments(df, "text", size, overlap)
      .select("doc_id", "chunk_idx", "chunk_start", "chunk")
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.sortBy(_.getInt(1)).map(r => (r.getInt(2), r.getString(3))).toList)
      .toMap

    texts.zipWithIndex.foreach { case (t, i) =>
      val cs = chunks(i.toLong)
      // starts tile at stride intervals from 0
      assert(cs.map(_._1) == cs.indices.map(_ * stride).toList)
      // every chunk is the exact substring of the original
      cs.foreach { case (start, c) =>
        assert(c == t.slice(start, start + size))
      }
      // reassembly: first chunk + each later chunk minus its overlap
      val rebuilt = cs.head._2 + cs.tail.map(_._2.drop(overlap)).mkString
      assert(rebuilt == t, s"doc $i reassembly")
      // chunk count: generation stops at the first window reaching the
      // end — ceil((len − size)/stride) + 1, minimum 1
      assert(cs.size ==
        math.max(1, math.ceil((t.length - size).toDouble / stride).toInt + 1))
      // no window is contained in its predecessor: each one must
      // extend coverage past the previous end (the old trailing-window
      // bug emitted a fully-contained duplicate tail)
      cs.sliding(2).foreach {
        case List((s0, c0), (s1, c1)) =>
          assert(s1 + c1.length > s0 + c0.length, s"doc $i window containment")
        case _ =>
      }
    }

    // null and empty texts contribute no rows; bad params rejected
    val edge = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
    assert(Curation.chunkDocuments(edge, "text", size, overlap).count() == 0)
    intercept[IllegalArgumentException](Curation.chunkDocuments(df, "text", 0, 0))
    intercept[IllegalArgumentException](Curation.chunkDocuments(df, "text", 64, 64))

    // chunking is a narrow map — no shuffle in the executed plan
    val plan = Curation.chunkDocuments(df, "text", size, overlap)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("repeatedPassages: cross-doc n-grams flagged; within-doc repeats count occurrences only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a lazy dog saw the quick brown fox run"), // shares "the quick brown fox" with 1
      (3L, "the quick brown fox the quick brown fox"), // shares it AND repeats it internally
      (4L, "completely different words here entirely"),
      (5L, "too short")).toDF("doc_id", "text")
    val out = Curation.repeatedPassages(docs, "doc_id", "text", n = 4, minDocs = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // "the quick brown fox": docs 1, 2, 3 (doc 3 twice) → df 3, occ 5?
    //   doc1: 1 occurrence; doc2: 1; doc3 grams of 8 words: positions
    //   0 and 4 give the phrase → 2 occurrences; total 4
    assert(out("the quick brown fox") == ((3L, 4L)), out)
    // "quick brown fox the" appears only inside doc 3 (df 1) → NOT flagged
    assert(!out.contains("quick brown fox the"), out)
    // nothing else shared
    assert(out.size == 1, out)
    intercept[IllegalArgumentException](
      Curation.repeatedPassages(docs, "doc_id", "text", n = 0))
    intercept[IllegalArgumentException](
      Curation.repeatedPassages(docs, "doc_id", "text", n = 4, minDocs = 1))
  }

  test("weightedSample: exact A-ES selection, layout-independent, weight-sensitive") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, if (i <= 10) 1000.0 else 1.0))
      .toDF("id", "w")
    val got = Curation.weightedSample(df.repartition(8), "id", col("w"), 50)
      .select("id").as[Long].collect().toSet
    // exact mirror of the operator's arithmetic: e = -ln((bucket+1)/2^28)/w
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(id: Long): Long = {
      val hex = md.digest(s"ws:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      java.lang.Long.parseLong(hex, 16)
    }
    val expect = (1L to 500L)
      .map { i =>
        val w = if (i <= 10) 1000.0 else 1.0
        (-math.log((bucket(i) + 1.0) / (1L << 28).toDouble) / w, i)
      }
      .sorted.take(50).map(_._2).toSet
    assert(got == expect)
    // the 1000x-weighted rows should essentially always be chosen
    assert((1L to 10L).toSet.subsetOf(got))
    // exactly k, deterministic across partitionings
    val again = Curation.weightedSample(df.repartition(1), "id", col("w"), 50)
      .select("id").as[Long].collect().toSet
    assert(again == got && got.size == 50)
    intercept[IllegalArgumentException](
      Curation.weightedSample(df, "id", col("w"), 0))
  }

  test("packSequences: concat-then-chunk fragments, exact offsets, boundary cases") {
    import spark.implicits._
    // one group, order by id, C=10: docs of 4, 10, 13, 3 tokens
    //   doc 1: stream [0, 3]   → seq 0 off 0, doc 0..3
    //   doc 2: stream [4, 13]  → seq 0 off 4 (6 toks), seq 1 off 0 (4 toks)
    //   doc 3: stream [14, 26] → seq 1 off 4 (6), seq 2 off 0 (7)
    //   doc 4: stream [27, 29] → seq 2 off 7 (3) — ends exactly at C
    val df = Seq((1L, 4L), (2L, 10L), (3L, 13L), (4L, 3L), (5L, 0L))
      .toDF("id", "n_tok").withColumn("g", lit("a"))
    val out = Curation.packSequences(df, "g", Seq("id"), "n_tok", seqLen = 10)
      .select("id", "seq_id", "doc_from", "doc_to", "seq_off", "n_in_seq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out == Set(
      (1L, 0L, 0L, 3L, 0L, 4L),
      (2L, 0L, 0L, 5L, 4L, 6L), (2L, 1L, 6L, 9L, 0L, 4L),
      (3L, 1L, 0L, 5L, 4L, 6L), (3L, 2L, 6L, 12L, 0L, 7L),
      (4L, 2L, 0L, 2L, 7L, 3L)), out.toString)
    // invariants: per-doc fragment tokens sum to the doc, per-seq ≤ C,
    // zero-token doc 5 emits nothing
    assert(!out.exists(_._1 == 5L))
    val bySeq = out.groupBy(_._2).view.mapValues(_.map(_._6).sum)
    assert(bySeq.toMap == Map(0L -> 10L, 1L -> 10L, 2L -> 10L))

    // groups pack independently; determinism across layouts
    val two = df.withColumn("g", when(col("id") <= 2, "a").otherwise("b"))
    val a = Curation.packSequences(two, "g", Seq("id"), "n_tok", 10)
      .collect().map(_.toString).sorted.toSeq
    val b = Curation.packSequences(two.repartition(5), "g", Seq("id"), "n_tok", 10)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
    intercept[IllegalArgumentException](
      Curation.packSequences(df, "g", Seq("id"), "n_tok", 0))
  }

  test("deterministicShuffle: layout-stable permutation, seed-keyed epochs") {
    import spark.implicits._
    val df = spark.range(1, 201).select(col("id"))
    val order1 = Curation.deterministicShuffle(df, "id", seed = 7L)
      .as[Long].collect().toSeq
    // a permutation of the corpus, not a sample
    assert(order1.sorted == (1L to 200L))
    // layout-independent: shuffling a differently-partitioned frame
    // yields the identical order (content-derived key, no RNG state)
    val order2 = Curation.deterministicShuffle(df.repartition(7), "id", 7L)
      .as[Long].collect().toSeq
    assert(order2 == order1)
    // epochs draw independent orders from their seed
    val epoch2 = Curation.deterministicShuffle(df, "id", seed = 8L)
      .as[Long].collect().toSeq
    assert(epoch2 != order1 && epoch2.sorted == (1L to 200L))
    // not the identity order (the hash actually permutes)
    assert(order1 != (1L to 200L).toSeq)
  }

  test("rebalanceClasses: every class cut to the minority size, deterministic, prefix-nested") {
    import spark.implicits._
    val df = ((1 to 30).map(i => ("en", i.toLong)) ++
      (31 to 40).map(i => ("de", i.toLong)) ++
      (41 to 45).map(i => ("fr", i.toLong))).toDF("lang", "doc_id")
      .withColumn("n_chars", col("doc_id") * 10)

    val out = Curation.rebalanceClasses(df, "doc_id", "lang", seed = 7L)
    val sizes = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // minority class has 5 rows -> every class keeps exactly 5
    assert(sizes == Map("en" -> 5L, "de" -> 5L, "fr" -> 5L))
    // all original columns survive
    assert(out.columns.toSeq == df.columns.toSeq)

    // layout independence: a different partitioning yields the same rows
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.rebalanceClasses(df.repartition(7), "doc_id", "lang", 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)

    // a different seed draws a different survivor set for the big class
    val ids3 = Curation.rebalanceClasses(df, "doc_id", "lang", seed = 8L)
      .filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids3 != ids.filter(_ <= 30))

    // prefix nesting: shrinking the minority (drop 2 fr rows -> min 3)
    // keeps each class's survivors a SUBSET of its min-5 survivors —
    // the hash order is per-class, so the cut only moves the prefix
    val df2 = df.filter(!(col("lang") === "fr" && col("doc_id") >= 44))
    val smaller = Curation.rebalanceClasses(df2, "doc_id", "lang", 7L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(smaller.size == 9 && smaller.subsetOf(ids ++ Set(41L, 42L, 43L)))
  }
}
