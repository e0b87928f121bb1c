package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Ksuid
import graft.ingest.{FirehoseRecords, Groom, Merge, PartitionStore}
import graft.queries.Tables
import graft.schema.Schema

/** End-to-end rewarded-decision pipeline over driver testdata: derive
  * a deterministic firehose JSONL stream from the `events` table, then
  * run the REAL ingest → merge (→ store → groom) dataflow.
  *
  * Derivation (so a SQL oracle can predict the merged result exactly):
  *   - every event becomes one decision record keyed by
  *     ksuid(ts, event_id) with `props` as the item;
  *   - every `purchase` event additionally emits one reward record of
  *     round(value, 2) against its OWN decision.
  * Hence: merged rows == #events; rewarded rows == #purchases;
  * Σ reward == Σ round(value, 2) over purchases.
  */
/** Stable on-disk location for gate artifacts that the driver's DuckDB
  * oracle re-reads AFTER the Verify JVM exits: the partition store the
  * store gate writes and the training-data dumps the train gate writes.
  * Keyed by scale-factor directory so a bench run at sf0.1 can never
  * clobber the sf0.01 artifacts the oracle is about to read. Verify
  * substitutes [[Placeholder]] in oracle SQL with [[dir]] at dump time,
  * so the SQL the driver executes points at this run's files.
  */
object GateArtifacts {
  val Placeholder = "__GRAFT_GATES__"

  /** A crashed build's staging orphan is reaped only once this old —
    * anything younger is presumed a live concurrent builder's tree.
    * No real build holds a staging dir for an hour; a crashed one
    * holds it forever.
    */
  private[graft] val StagingReapAgeMs: Long = 60L * 60 * 1000

  /** Scratch root for gate-lifetime artifacts: RAM-backed when the
    * host offers it, same convention as the streaming replay dirs
    * (StreamingOps.replayDir). Gate artifacts are harness surface —
    * rebuilt per invocation, read back by the in-gate census and the
    * driver's DuckDB oracle (a separate process: tmpfs files persist
    * across processes, and dir() stays deterministic) — so their
    * fsync/journal traffic on a real disk is bench noise billed to
    * whichever gate the page-cache flush lands on, not engine cost.
    * Production writes go wherever the caller points the operators
    * (PartitionStore/ModelStore take explicit base dirs); nothing
    * outside the gate/bench harness reads this root. Override with
    * SPARK_GRAFT_GATES_DIR (e.g. to force disk when RAM is tight).
    */
  /** tmpfs is typically capped at 50% of RAM and shared with the JVM
    * heap; a nearly-full /dev/shm would ENOSPC mid-gate (or pressure
    * the OOM killer) with only the env override as an escape hatch, so
    * the RAM default requires this much usable space — generous next
    * to the fixture artifacts (sf0.1 writes well under 1 GiB) — and
    * falls back to disk otherwise.
    */
  private[graft] val MinShmUsableBytes: Long = 8L << 30

  private[graft] lazy val scratchRoot: String =
    sys.env.get("SPARK_GRAFT_GATES_DIR").getOrElse {
      val shm = java.nio.file.Paths.get("/dev/shm")
      val usable =
        try
          if (java.nio.file.Files.isDirectory(shm) &&
            java.nio.file.Files.isWritable(shm))
            java.nio.file.Files.getFileStore(shm).getUsableSpace
          else 0L
        catch { case _: java.io.IOException => 0L }
      if (usable >= MinShmUsableBytes) shm.toString
      else System.getProperty("java.io.tmpdir")
    }

  def dir(sfDir: String): String = {
    val tag = java.nio.file.Paths.get(sfDir).toAbsolutePath.toString
      .replaceAll("[^A-Za-z0-9.]+", "_")
    s"$scratchRoot/graft_gates$tag"
  }

  /** Create a RAM-backed-when-available temp dir (scratchRoot doc). */
  private[graft] def scratchTempDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(scratchRoot), prefix).toString

  /** Build a named artifact slot ATOMICALLY: `build` writes into a
    * staging directory, and only a fully-built staging tree is swapped
    * into the published slot path (delete old + same-filesystem atomic
    * rename). Each gate owns one slot and rebuilds it per invocation,
    * so a repeated run (bench repeats, local iteration) never censuses
    * stale files — and a crash mid-build leaves the PREVIOUS slot
    * intact, while a crash mid-swap leaves no slot at all (the census
    * then fails loudly on a missing path). Never a torn half-written
    * slot silently censused as complete. Returns the published path.
    */
  def buildSlot(sfDir: String, name: String)(build: String => Unit): String = {
    val slot = s"${dir(sfDir)}/$name"
    // UUID staging name: two concurrent builders (separate JVMs) must
    // not write into each other's staging tree — last rename wins the
    // slot, which is the same winner-takes-all a concurrent freshSlot
    // rewrite had, minus the torn-interleaving. Orphans from CRASHED
    // builds (which never reach their own deleteTree) are reaped here
    // so retries start clean and /tmp stays flat — but ONLY staging
    // dirs older than `StagingReapAgeMs`: a young staging sibling may
    // belong to a LIVE concurrent builder, and deleting it would crash
    // that builder mid-write instead of letting rename order decide.
    val parent = java.nio.file.Paths.get(slot).getParent
    if (java.nio.file.Files.isDirectory(parent)) {
      val now = System.currentTimeMillis()
      val siblings = java.nio.file.Files.list(parent)
      try siblings.filter { p =>
        p.getFileName.toString.startsWith(s"$name.staging-") &&
          (try now - java.nio.file.Files.getLastModifiedTime(p).toMillis > StagingReapAgeMs
           catch { case _: java.io.IOException => false }) // vanished concurrently
      }.forEach(deleteTree(_))
      finally siblings.close()
    }
    val staging = java.nio.file.Paths.get(
      s"$slot.staging-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.createDirectories(staging)
    try build(staging.toString)
    catch { case e: Throwable => deleteTree(staging); throw e }
    deleteTree(java.nio.file.Paths.get(slot))
    java.nio.file.Files.move(staging, java.nio.file.Paths.get(slot),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    slot
  }

  /** Depth-first recursive delete with the `Files.walk` stream CLOSED
    * (an unclosed walk leaks a directory handle per invocation).
    */
  private[graft] def deleteTree(root: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally walk.close()
    }
}

object RdrPipeline {

  private def ksuidCol(ts: org.apache.spark.sql.Column, seed: org.apache.spark.sql.Column) =
    graft.functions.KsuidExpressions.ksuidDeterministic(ts, seed)

  // the three gate queries all consume the same derived stream —
  // generate it once per (JVM, sfDir); cleaned up at JVM exit
  private val firehoseCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def cachedFirehose(spark: SparkSession, sfDir: String): String =
    firehoseCache.computeIfAbsent(sfDir, { _ =>
      val dir = GateArtifacts.scratchTempDir("rdr_fh_cache")
      generateFirehose(spark, sfDir, dir)
      sys.addShutdownHook(deleteRecursively(dir))
      dir
    })

  // ... and all three also consume the same MERGED result: the gzip
  // JSONL parse + hash-agg merge is the gates' shared fixed cost, so it
  // too is materialized once per (JVM, sfDir). Parquet, not persist():
  // the verify/bench harnesses clearCache() between queries.
  private val mergedCache = new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Fixture-scale shuffle width for the train gates — see
    * [[graft.core.ConfScope.withShufflePartitions]] (one shared
    * definition with the streaming replay gates). A production 8M-row
    * run keeps whatever its session configures.
    */
  private def withGateShuffle[T](s: SparkSession)(body: => T): T =
    graft.core.ConfScope.withShufflePartitions(s, 8)(body)

  /** Bench setup hook: force the firehose generation + ingest merge
    * now so the shared fixed cost lands in the explicit `setup` entry
    * instead of whichever rdr gate runs first.
    */
  private[graft] def warmDerived(spark: SparkSession, sfDir: String): Unit = {
    cachedMerged(spark, sfDir); ()
  }

  /** Gates that consume [[cachedMerged]]/[[cachedFirehose]]. */
  private[graft] val derivedConsumers: Set[String] =
    Set("q_rdr_merge", "q_rdr_train", "q_train_soft", "q_rdr_store")

  private def cachedMerged(spark: SparkSession, sfDir: String): DataFrame = {
    // undeclared consumers fail loudly — see GateContext
    graft.core.GateContext.assertDeclared("setup_rdr_merged", derivedConsumers)
    val dir = mergedCache.computeIfAbsent(sfDir, { _ =>
      val out = GateArtifacts.scratchTempDir("rdr_merged")
      val fh = cachedFirehose(spark, sfDir)
      Merge.ingest(spark, firehoseFiles(fh))
        .write.mode("overwrite").parquet(s"$out/merged")
      sys.addShutdownHook(deleteRecursively(out))
      s"$out/merged"
    })
    spark.read.parquet(dir)
  }

  /** Events → gzipped firehose JSONL under `outDir` (deterministic). */
  def generateFirehose(spark: SparkSession, sfDir: String, outDir: String): Unit = {
    val ev = Tables.events(spark, sfDir)
      .withColumn("_sec", col("ts").cast("long"))
    val decisions = ev.select(concat(
      lit("""{"message_id":""""), ksuidCol(col("_sec"), col("event_id")),
      lit("""","model":"events","count":2,"item":"""), col("props"),
      lit(""","context":{"t":""""), col("event_type"), lit(""""}}""")).as("value"))
    val rewards = ev.filter(col("event_type") === "purchase").select(concat(
      lit("""{"message_id":""""), ksuidCol(col("_sec"), col("event_id") + 1000000000L),
      lit("""","model":"events","decision_id":""""), ksuidCol(col("_sec"), col("event_id")),
      lit("""","reward":"""), round(col("value"), 2), lit("}")).as("value"))
    // events.parquet is a single small file → one input partition; gzip
    // is unsplittable, so without an explicit fan-out the whole
    // downstream JSONL parse would run on one or two cores. Round-robin
    // repartition is safe: merge semantics are row-order independent.
    decisions.unionByName(rewards)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").option("compression", "gzip").text(outDir)
  }

  private def firehoseFiles(dir: String): Seq[String] =
    new java.io.File(dir).listFiles().toSeq
      .map(_.getPath).filter(_.endsWith(".txt.gz"))

  private def deleteRecursively(dir: String): Unit =
    GateArtifacts.deleteTree(java.nio.file.Paths.get(dir))

  /** ingest → merge → summary row (the gate query; DuckDB-checkable). */
  def mergeSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val merged = cachedMerged(spark, sfDir)
    // integer-units census (cents), not round(x, 2): a decimal round
    // of a double is the engines' HALF_UP-vs-binary flake class this
    // repo documents — an integer is rendered identically everywhere
    val r = merged.agg(
      count(lit(1)).as("n_decisions"),
      sum(when(col(Schema.Reward) > 0, 1L).otherwise(0L)).as("n_rewarded"),
      round(sum(Schema.Reward) * 100).cast("long").as("total_reward_cents"))
      .collect().head
    Seq((r.getLong(0), r.getLong(1), r.getLong(2)))
      .toDF("n_decisions", "n_rewarded", "total_reward_cents")
  }

  /** Per-JVM accumulator of q_rdr_train pass timings (JSON object
    * strings) — see the timings.json write in [[trainSummary]].
    */
  private val trainPasses =
    new java.util.concurrent.CopyOnWriteArrayList[String]()

  /** A trained two-phase chain: both models plus whether phase 1 was
    * served from a warm checkpoint instead of retrained.
    */
  final case class TrainedChain(
      propensity: graft.train.Trainer.PropensityModel,
      decision: graft.train.Trainer.DecisionModel,
      phase1Warm: Boolean)

  /** The USER-FACING two-phase training chain over an EXISTING
    * partition store. `storeDir` is the caller's durable location
    * (object-store prefix, HDFS dir, …), reusable across invocations —
    * unlike the gate wrappers below, nothing here is temp-dir scoped.
    *
    * `ckptDir` enables the reference trainer's warm start
    * (checkpoint.py:26-110): a fresh, version-matching phase-1
    * checkpoint there is REUSED instead of retraining phase 1, and a
    * cold run saves one for the next invocation. `phaseTap` is called
    * with each loaded phase frame before training (census dumps,
    * debugging); the default does nothing.
    */
  def trainFromStore(spark: SparkSession, storeDir: String, model: String,
      cfg: graft.train.Trainer.TrainConfig,
      ckptDir: Option[String] = None,
      maxRows: Long = 8000000L,
      checkpointMaxAgeSeconds: Long = 24 * 3600,
      phaseTap: (Int, DataFrame) => Unit = (_, _) => ()): TrainedChain = {
    import graft.train.{Loader, ModelStore, Trainer}
    val sample = if (cfg.explore) graft.encoding.Encoding.NonZeroPoissonProbability else 1.0
    val warm = ckptDir.flatMap(d =>
      ModelStore.loadCheckpoint(spark, d, checkpointMaxAgeSeconds))
    val pm = warm.getOrElse {
      // phase 1: minRows = maxRows realizes the scarce-data override
      // (the explore sample only thins data the cap would drop anyway)
      val phase1 = Trainer.step("load1")(Loader.load(spark, storeDir, model,
        maxRows = maxRows, minRows = maxRows, sample = sample, seed = cfg.seed)
        .withColumn(Schema.Model, lit(model)).persist())
      try {
        Trainer.step("tap1")(phaseTap(1, phase1))
        val trained = Trainer.trainPropensity(phase1, cfg)
        Trainer.step("ckptSave")(
          ckptDir.foreach(d => ModelStore.saveCheckpoint(trained, d)))
        trained
      } finally { phase1.unpersist(); () }
    }
    val phase2 = Trainer.step("load2")(Loader.load(spark, storeDir, model,
      maxRows = maxRows, sample = sample, seed = cfg.seed + 1)
      .withColumn(Schema.Model, lit(model)).persist())
    try {
      Trainer.step("tap2")(phaseTap(2, phase2))
      TrainedChain(pm, Trainer.trainDecision(phase2, pm, cfg), warm.isDefined)
    } finally { phase2.unpersist(); () }
  }

  /** The FULL reference chain in one query: ingest → merge → partition
    * store → listing-driven load (S4/O3/P3/P4) → two-phase train →
    * score a probe item. The gate output is the DATA-SIDE pre-fit
    * census: the loaded phase-1/phase-2 training frames and the
    * selected feature lists are dumped to [[GateArtifacts]], the census
    * is computed by reading those dumps back, and the driver's DuckDB
    * oracle recomputes the identical census from the same files (plus
    * the genuine cross-link n_rows_p1 == count(events), which holds
    * because phase 1's scarce-data override disables sampling below
    * maxRows and the derived stream has no orphans). Model internals
    * (trees, checkpoint round-trip, probe score) stay in-gate as loud
    * requires — they are not SQL-expressible, but a failure still
    * fails the gate. Small tree/depth config keeps the gate fast; the
    * operators are the real ones.
    */
  def trainSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.train.{Loader, Trainer}
    import spark.implicits._
    // the whole chain builds in a STAGING dir; only a fully-built tree
    // is swapped into the slot the oracle SQL reads (see buildSlot)
    val slot = GateArtifacts.buildSlot(sfDir, "train") { stage =>
      // sub-step wall-times: printed to stderr AND published with the
      // slot, so a bench-time growth in this (heaviest) gate decomposes
      // into merge / store-write / train as measured fact, not
      // data-shape guesswork
      val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
      def timed[A](step: String)(body: => A): A = {
        val t0 = System.nanoTime()
        try body finally timings(step) = (System.nanoTime() - t0) / 1e9
      }
      val ingested = timed("merge")(cachedMerged(spark, sfDir))
      // Recompute staging: `ingested` is the materialized merged-cache
      // parquet — already cheap re-runnable columnar input
      timed("store_write")(PartitionStore.write(ingested, s"$stage/store", "events",
        staging = PartitionStore.Staging.Recompute))
      val cfg = Trainer.TrainConfig(
        maxFeatures = 20, pruneMinStringCount = 0, maxTrees = 5,
        propensityTrees = 5, treeDepth = 4, seed = 42L)
      // the gate runs the USER-FACING chain (trainFromStore): explore
      // bootstrap, scarce-data override, checkpoint save — with a tap
      // that dumps each phase's data-side frame for the oracle census
      val chain = timed("train")(withGateShuffle(spark)(
        trainFromStore(spark, s"$stage/store", "events", cfg,
          ckptDir = Some(s"$stage/ckpt"),
          phaseTap = (phase, df) =>
            df.select(Schema.DecisionId, Schema.Reward, Schema.Count)
              .write.mode("overwrite").parquet(s"$stage/phase$phase"))))
      val pm = chain.propensity
      val dm = chain.decision
      require(!chain.phase1Warm, "q_rdr_train: fresh slot must cold-start phase 1")
      // checkpoint round-trip: the cold run saved phase 1 at ckpt — a
      // silent feature/table drift through save/load fails loudly here
      // (checkpoint.py:26-110 is the reference's warm-start branch;
      // RdrPipelineSpec covers the actual warm reuse across invocations)
      val reloaded = graft.train.ModelStore.loadCheckpoint(spark, s"$stage/ckpt")
        .getOrElse(sys.error("q_rdr_train: checkpoint failed to reload"))
      require(reloaded.featureNames == pm.featureNames &&
        reloaded.stringTables == pm.stringTables &&
        reloaded.modelSeed == pm.modelSeed,
        "q_rdr_train: reloaded checkpoint differs from the trained phase-1 model")
      pm.featureNames.toDF("feature").coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/features_p1")
      dm.featureNames.toDF("feature").coalesce(1)
        .write.mode("overwrite").parquet(s"$stage/features_p2")
      // model-internal invariants: loud in-gate failures, not census rows
      require(pm.model.getNumTrees > 0 && dm.model.getNumTrees > 0,
        "q_rdr_train: a phase trained zero trees")
      val probeScore = graft.train.Scorer
        .rank(spark, dm, Seq("""{"k":50}"""), """{"t":"click"}""").head._2
      require(!probeScore.isNaN && !probeScore.isInfinite,
        s"q_rdr_train: non-finite probe score $probeScore")
      val line = timings.map { case (k, v) => f"$k=$v%.1fs" }.mkString(" ")
      System.err.println(s"[timing] q_rdr_train $line")
      // Locale.ROOT: the f interpolator renders %.3f with the JVM
      // default locale — a comma decimal separator would make this
      // invalid JSON that Bench splices verbatim into its output
      val passJson = timings.map { case (k, v) =>
        s""""$k": ${String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))}""" }
        .mkString("{", ", ", "}")
      // EVERY pass this JVM ran, keyed by pass index — the bench's
      // heaviest-gate decomposition previously recorded whichever pass
      // wrote the slot last, which could pair a cold outlier's steps
      // with a median headline. The in-JVM buffer resets per process,
      // so a stale prior JVM's passes never leak in.
      trainPasses.add(passJson)
      val all = (0 until trainPasses.size())
        .map(i => s""""pass$i": ${trainPasses.get(i)}""")
        .mkString("{", ", ", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(stage, "timings.json"), all)
    }
    // census from the READ-BACK, PUBLISHED dumps — byte-identical
    // input to what the DuckDB oracle reads
    val p1 = spark.read.parquet(s"$slot/phase1")
    val p2 = spark.read.parquet(s"$slot/phase2")
    // integer-units census (see mergeSummary): rewards are exact 2dp
    // cents, so mean/std derive from EXACT integer moments (S1, S2 in
    // DECIMAL) with one half-up division / one sqrt of an
    // exact-int-derived double — engine-built avg/stddev float sums
    // (partial-agg order) never touch the published digits. The
    // formula text is mirrored in the q_rdr_train oracle.
    val r1 = p1.agg(count(lit(1)),
      round(sum(Schema.Count) * 100).cast("long")).collect().head
    val r2 = p2.agg(count(lit(1)),
      expr("CAST((2 * sum(CAST(round(reward * 100) AS DECIMAL(38,0))) * 100" +
        " + count(1)) div (2 * count(1)) AS BIGINT)"),
      expr("CASE WHEN count(1) < 2 THEN CAST(0 AS BIGINT) ELSE" +
        " CAST(round(sqrt((CAST(count(1) AS DOUBLE)" +
        " * CAST(sum(CAST(round(reward * 100) AS DECIMAL(38,0))" +
        "         * CAST(round(reward * 100) AS BIGINT)) AS DOUBLE)" +
        " - CAST(sum(CAST(round(reward * 100) AS DECIMAL(38,0))) AS DOUBLE)" +
        " * CAST(sum(CAST(round(reward * 100) AS DECIMAL(38,0))) AS DOUBLE))" +
        " / (CAST(count(1) AS DOUBLE) * (count(1) - 1))) * 100) AS BIGINT) END"))
      .collect().head
    val nEvents = Tables.events(spark, sfDir).count()
    val nf1 = spark.read.parquet(s"$slot/features_p1").count()
    val nf2 = spark.read.parquet(s"$slot/features_p2").count()
    Seq((r1.getLong(0), r2.getLong(0), nEvents, nf1, nf2,
      r1.getLong(1), r2.getLong(1), r2.getLong(2)))
      .toDF("n_rows_p1", "n_rows_p2", "n_events", "n_features_p1",
        "n_features_p2", "total_count_p1_x100", "reward_mean_x1e4",
        "reward_std_x1e4")
  }

  /** Curation-weighted training chain: the merged rewarded decisions
    * get (a) SOFT-DEDUP weights — exact-duplicate clusters on the
    * canonical (item, context) payload, each row downweighted by its
    * cluster's multiplicity via [[graft.operators.Dedup.softWeights]]
    * — and (b) a RECENCY feature — the per-event-type time-decayed
    * engagement from [[graft.operators.Temporal.decayedSum]], injected
    * into the context JSON so the encoder sees it as a real numeric
    * feature. Both phases then train with the soft weight multiplying
    * the phase-2 IPW/Poisson weight (TrainConfig.rowWeightCol), the
    * reference-weighting analogue (decision_trainer.py:99-135).
    *
    * The gate output is a per-event-type census of the weight/recency
    * relations. The (decision_id, cluster, et) assignment is dumped to
    * [[GateArtifacts]]; the DuckDB oracle RE-DERIVES multiplicities and
    * weights from the dumped cluster labels and the decayed recency
    * straight from `events` — both engines compute the census
    * independently from first principles. Model fits stay in-gate as
    * loud requires (not SQL-expressible).
    *
    * Scale shape: the cluster census is one hash agg on the payload
    * key; weights ride a keyed join; the decayed relation is
    * |event_type|-rows and broadcast. No collects, no windows over the
    * corpus.
    */
  def softTrainSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.train.Trainer
    val merged = cachedMerged(spark, sfDir)
    val clusters = merged
      .groupBy(Schema.Item, Schema.Context)
      .agg(min(col(Schema.DecisionId)).as("cluster"))
    val assign = merged
      .select(col(Schema.DecisionId).as("id"), col(Schema.Item), col(Schema.Context))
      .join(clusters, Seq(Schema.Item, Schema.Context))
      .select(col("id"), col("cluster"))
    val decayed = graft.operators.Temporal.decayedSum(
      Tables.events(spark, sfDir).select(col("event_type"), col("ts"),
        round(col("value") * 100).cast("long").as("cents")),
      Seq("event_type"), "ts", "cents", halfLifeDays = 7)
      .select(col("event_type").as("_et"), col("decayed_x1e6"))
    val enriched = graft.operators.Dedup.softWeights(merged, Schema.DecisionId, assign)
      .join(assign.select(col("id").as(Schema.DecisionId), col("cluster")),
        Seq(Schema.DecisionId))
      .withColumn("_et", get_json_object(col(Schema.Context), "$.t"))
      .join(broadcast(decayed), Seq("_et"), "left")
      // keys alphabetical to match the canonical-JSON convention
      .withColumn(Schema.Context,
        concat(lit("""{"recency":"""), coalesce(col("decayed_x1e6"), lit(0L)),
          lit(""","t":""""), col("_et"), lit(""""}""")))
      .withColumn("_soft_w", col("weight_x1e6").cast("double") / 1e6)
    val slot = GateArtifacts.buildSlot(sfDir, "soft") { stage =>
      val e = enriched.persist()
      try {
        e.select(col(Schema.DecisionId), col("cluster"), col("_et").as("et"))
          .write.mode("overwrite").parquet(s"$stage/weights")
        val cfg = Trainer.TrainConfig(maxFeatures = 20, pruneMinStringCount = 0,
          maxTrees = 3, propensityTrees = 3, treeDepth = 3, seed = 7L,
          rowWeightCol = Some("_soft_w"))
        val (pm, dm) = withGateShuffle(spark) {
          val p = Trainer.trainPropensity(e, cfg)
          (p, Trainer.trainDecision(e, p, cfg))
        }
        require(pm.model.getNumTrees > 0 && dm.model.getNumTrees > 0,
          "q_train_soft: a phase trained zero trees")
        require(pm.featureNames.exists(_.contains("recency")),
          "q_train_soft: the injected recency feature was not selected " +
            s"(features: ${pm.featureNames.mkString(", ")})")
      } finally { e.unpersist(blocking = false); () }
    }
    // census from the READ-BACK dump: multiplicities/weights
    // re-derived from the cluster labels (exactly what the oracle does)
    val w = spark.read.parquet(s"$slot/weights")
    val sizes = w.groupBy("cluster").agg(count(lit(1)).as("_sz"))
    w.join(sizes, Seq("cluster"))
      .withColumn("w_x1e6", expr("1000000 div _sz"))
      .groupBy(col("et").as("event_type"))
      .agg(
        count(lit(1)).as("n_decisions"),
        countDistinct("cluster").as("n_clusters"),
        sum((col("_sz") >= 2).cast("long")).as("n_downweighted"),
        sum("w_x1e6").as("sum_weight_x1e6"))
      .join(decayed.withColumnRenamed("_et", "event_type"),
        Seq("event_type"), "left")
      .select(col("event_type"), col("n_decisions"), col("n_clusters"),
        col("n_downweighted"), col("sum_weight_x1e6"),
        coalesce(col("decayed_x1e6"), lit(0L)).as("decayed_x1e6"))
      .orderBy("event_type")
  }

  /** Full dataflow incl. partition store + groom; the store is written
    * to [[GateArtifacts]] and the census (row count, reward total, file
    * count, id range) is computed by reading the written files back, so
    * the driver's DuckDB oracle can recompute the identical census
    * straight from the store parquet — layout AND content verified.
    */
  def storeSummary(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    // store + groom build in staging; the census below reads the
    // PUBLISHED slot the oracle SQL also reads (see buildSlot)
    val slot = GateArtifacts.buildSlot(sfDir, "store") { stage =>
      val merged = graft.train.Trainer.step("store.merged")(
        cachedMerged(spark, sfDir))
      // Recompute staging: `merged` is the materialized merged-cache
      // parquet — already cheap re-runnable columnar input
      graft.train.Trainer.step("store.write")(
        PartitionStore.write(merged, stage, "events",
          staging = PartitionStore.Staging.Recompute))
      graft.train.Trainer.step("store.groom")(
        Groom.groom(spark, stage, "events"))
    }
    val keys = PartitionStore.listKeys(spark, slot, "events")
    Groom.assertNoOverlappingKeys(keys)
    val back = PartitionStore.read(spark, slot, keys)
    val stats = back.agg(
      count(lit(1)).as("n_rows"),
      // integer-units (cents), see mergeSummary
      round(sum(Schema.Reward) * 100).cast("long").as("total_reward_cents"),
      min(Schema.DecisionId).as("min_id"),
      max(Schema.DecisionId).as("max_id")).collect().head
    // serving-path probe: a point lookup of the store's min id must
    // open only its covering file(s) and return exactly one row —
    // exercises lookupDecision inside the gate chain (in-gate
    // invariant; file-open behavior is not SQL-expressible)
    val probe = PartitionStore.lookupDecision(spark, slot, "events", stats.getString(2))
    require(probe.count() == 1L &&
      probe.inputFiles.length < math.max(2, keys.length),
      "q_rdr_store: point lookup did not prune to the covering file")
    Seq((stats.getLong(0), stats.getLong(1), keys.length.toLong,
      stats.getString(2), stats.getString(3)))
      .toDF("n_rows", "total_reward_cents", "n_files", "min_id", "max_id")
  }
}
