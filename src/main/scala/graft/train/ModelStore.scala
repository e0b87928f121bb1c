package graft.train

import org.apache.spark.ml.classification.GBTClassificationModel
import org.apache.spark.ml.regression.GBTRegressionModel
import org.apache.spark.sql.SparkSession

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.{CanonicalJson, Tar}
import graft.train.Trainer.{DecisionModel, PropensityModel}

import org.apache.hadoop.fs.{Path => HPath}

/** Model artifact + checkpoint layout (reference: model_utils.py
  * metadata embedding, checkpoint.py phase-1 reuse, unpack_models.py
  * publish layout). The booster is the MLlib model directory; the
  * reference's in-booster attributes become a metadata.json sidecar
  * (string tables, feature names, seed, created_at, version).
  *
  * All IO goes through the Hadoop FileSystem API so artifact dirs may
  * live on any supported filesystem (local, HDFS, object stores) —
  * the same place the MLlib model itself is written.
  */
object ModelStore {

  private def fs(dir: String) = {
    val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
    new HPath(dir).getFileSystem(conf)
  }

  /** Swap a fully-written `tmp` directory into place at `root` with
    * move-aside semantics (the same pattern as the index builds in
    * InvertedIndex/IvfIndex): never delete-then-rename — every crash
    * window leaves either the old or the new artifact live at `root`,
    * and a failed swap restores the old instead of destroying it.
    */
  private def swapIn(f: org.apache.hadoop.fs.FileSystem, tmp: HPath, root: HPath): Unit = {
    f.mkdirs(root.getParent)
    val old = new HPath(root.getParent,
      s".${root.getName}.old-${java.util.UUID.randomUUID()}")
    val hadOld = f.exists(root)
    if (hadOld && !f.rename(root, old))
      throw new java.io.IOException(s"swap: move-aside of $root failed")
    if (!f.rename(tmp, root)) {
      if (hadOld) f.rename(old, root)
      f.delete(tmp, true)
      throw new java.io.IOException(s"swap $tmp -> $root failed")
    }
    if (hadOld) { f.delete(old, true); () }
  }

  private def writeString(dir: String, name: String, content: String): Unit = {
    val f = fs(dir)
    f.mkdirs(new HPath(dir))
    val out = f.create(new HPath(dir, name), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  private def readString(dir: String, name: String): Option[String] =
    readBytes(dir, name).map(new String(_, "UTF-8"))

  private def writeBytes(dir: String, name: String, content: Array[Byte]): Unit = {
    val f = fs(dir)
    f.mkdirs(new HPath(dir))
    val out = f.create(new HPath(dir, name), true)
    try out.write(content) finally out.close()
  }

  private def readBytes(dir: String, name: String): Option[Array[Byte]] = {
    val f = fs(dir)
    val p = new HPath(dir, name)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in))
      finally in.close()
    }
  }

  val Version = "1.0"

  private val mapper = new ObjectMapper()

  private def metadataJson(featureNames: Seq[String], tables: Map[String, Seq[Long]],
      modelSeed: Long, extra: Map[String, Double]): String = {
    val root = mapper.createObjectNode()
    root.put("version", Version)
    root.put("model_seed", modelSeed)
    root.put("created_at", java.time.Instant.now().toString)
    val fn = root.putArray("feature_names")
    featureNames.foreach(fn.add)
    val st = root.putObject("string_tables")
    tables.foreach { case (k, hashes) =>
      val arr = st.putArray(k)
      hashes.foreach(arr.add)
    }
    extra.foreach { case (k, v) => root.put(k, v) }
    CanonicalJson.dumps(root)
  }

  // ---- phase-1 checkpoint (M4) -------------------------------------------

  def saveCheckpoint(pm: PropensityModel, dir: String): Unit = {
    // stage the WHOLE checkpoint (model + metadata) in a side dir, then
    // swap it in: writing the pieces in place would let a crash between
    // the model save and the metadata write pair a NEW booster with
    // yesterday's still-valid metadata — loadCheckpoint would then
    // encode with the wrong feature/string mapping and silently poison
    // phase-2 propensities. The crash windows of the swap leave either
    // the old checkpoint or none (loadCheckpoint → None → retrain,
    // which is always safe: the checkpoint is an optimization).
    val root = new HPath(dir)
    val f = fs(dir)
    val tmp = new HPath(root.getParent, s".${root.getName}.tmp-${java.util.UUID.randomUUID()}")
    pm.model.write.overwrite().save(s"$tmp/phase1_model")
    writeString(tmp.toString, "metadata.json",
      metadataJson(pm.featureNames, pm.stringTables, pm.modelSeed,
        Map("mean_item_count" -> pm.meanItemCount)))
    swapIn(f, tmp, root)
  }

  /** Reuse the phase-1 model when version matches and it is younger
    * than maxAgeSeconds (checkpoint.py:26-110).
    */
  def loadCheckpoint(spark: SparkSession, dir: String,
      maxAgeSeconds: Long = 24 * 3600,
      now: java.time.Instant = java.time.Instant.now()): Option[PropensityModel] = {
    // make the parameter REAL: filesystem resolution and the MLlib
    // model load below go through the active session, so bind the
    // caller's session first — a caller passing a dedicated session
    // must not silently get a different one
    SparkSession.setActiveSession(spark)
    val metaText = readString(dir, "metadata.json").getOrElse(return None)
    try {
      val meta = CanonicalJson.parse(metaText)
      if (meta.get("version").textValue() != Version) return None
      val created = java.time.Instant.parse(meta.get("created_at").textValue())
      if (java.time.Duration.between(created, now).getSeconds > maxAgeSeconds) return None
      val names = (0 until meta.get("feature_names").size())
        .map(meta.get("feature_names").get(_).textValue())
      val tablesNode = meta.get("string_tables")
      val tables = scala.jdk.CollectionConverters.IteratorHasAsScala(tablesNode.fieldNames())
        .asScala.map { f =>
          val arr = tablesNode.get(f)
          f -> (0 until arr.size()).map(arr.get(_).longValue()).toSeq
        }.toMap
      val model = GBTClassificationModel.load(s"$dir/phase1_model")
      Some(PropensityModel(model, names, tables,
        meta.get("model_seed").longValue(), meta.get("mean_item_count").doubleValue()))
    } catch { case _: Exception => None }
  }

  // ---- final model publish (S9/S10 layout) -------------------------------

  def saveDecisionModel(dm: DecisionModel, dir: String): Unit = {
    // same stage-then-swap as saveCheckpoint (move-aside via swapIn): writing model and
    // metadata in place lets a crash between the two pair a NEW
    // booster with stale metadata — loads would then encode with the
    // wrong string tables and de-normalize with the wrong mean/std,
    // silently. Every crash window of the swap leaves the old artifact
    // or none.
    val root = new HPath(dir)
    val f = fs(dir)
    val tmp = new HPath(root.getParent, s".${root.getName}.tmp-${java.util.UUID.randomUUID()}")
    dm.model.write.overwrite().save(s"$tmp/model")
    writeString(tmp.toString, "metadata.json",
      metadataJson(dm.featureNames, dm.stringTables, dm.modelSeed,
        Map("reward_mean" -> dm.rewardMean, "reward_std" -> dm.rewardStd)))
    // native `.xgb` booster (XGBoost4J probe hit at train time): part
    // of the artifact dir, so publish/unpack tar it automatically
    dm.nativeBooster.foreach(b =>
      writeBytes(tmp.toString, Boosters.NativeBoosterFile, b))
    // CoreML `.mlmodel` (model_utils.py:275-321): the tree ensemble +
    // the same metadata JSON in the userDefined dictionary, so Apple-
    // device consumers get the artifact the reference publishes. See
    // CoreMLExport for the (documented) offline validation boundary.
    writeBytes(tmp.toString, CoreMLExport.MlModelFile,
      CoreMLExport.toMlModelBytes(dm.model, dm.featureNames,
        Map("graft.metadata.json" ->
          metadataJson(dm.featureNames, dm.stringTables, dm.modelSeed,
            Map("reward_mean" -> dm.rewardMean, "reward_std" -> dm.rewardStd)))))
    swapIn(f, tmp, root)
  }

  // ---- publish layout (unpack_models.py:62-97) ---------------------------
  //
  // The reference gzips each booster and writes
  //   models/archive/{name}/{name}-{yyyy-MM-dd-HH-mm-ss}-{uuid}.xgb.gz
  // then copies it to models/latest/{name}.xgb.gz — the key consumers
  // poll. Our booster is an MLlib model DIRECTORY, so the single-file
  // artifact is a tar.gz bundle of that directory (the same model.tar.gz
  // shape the reference's unpack lambda itself consumes).

  val PublishExtension = ".tar.gz"

  def latestKey(modelName: String): String =
    s"models/latest/$modelName$PublishExtension"

  private def archiveKey(modelName: String, now: java.time.Instant): String = {
    val ts = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd-HH-mm-ss")
      .withZone(java.time.ZoneOffset.UTC).format(now)
    s"models/archive/$modelName/$modelName-$ts-${java.util.UUID.randomUUID()}$PublishExtension"
  }

  /** Recursively list regular files under dir as
    * (relativeName, path, length), sorted by name for deterministic
    * archives. The length rides along from listStatus so publish never
    * re-stats each file (one RPC per file on a remote store).
    */
  private def walk(f: org.apache.hadoop.fs.FileSystem, root: HPath): Seq[(String, HPath, Long)] = {
    // qualify BOTH sides before prefix-stripping: listStatus returns
    // fully-qualified paths, so a relative `root` (legal CLI input)
    // would strip nothing and yield near-absolute entry names that
    // blow the 100-char tar field or unpack to wrong directories
    val rootUri = f.makeQualified(root).toUri.getPath
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, HPath, Long)]
    def go(p: HPath): Unit = f.listStatus(p).foreach { st =>
      if (st.isDirectory) go(st.getPath)
      else {
        val full = f.makeQualified(st.getPath).toUri.getPath
        val rel = full.stripPrefix(rootUri).stripPrefix("/")
        out += ((rel, st.getPath, st.getLen))
      }
    }
    go(root)
    out.sortBy(_._1).toSeq
  }

  /** Bundle a saved model directory (model/ + metadata.json) into a
    * gzipped tar and publish it under modelsRoot as both a timestamped
    * archive object and the `models/latest/{name}.tar.gz` key consumers
    * poll. Returns (archiveKey, latestKey).
    */
  def publish(modelDir: String, modelsRoot: String, modelName: String,
      now: java.time.Instant = java.time.Instant.now()): (String, String) = {
    val f = fs(modelDir)
    val outFs = fs(modelsRoot)
    val arcKey = archiveKey(modelName, now)
    val arcPath = new HPath(modelsRoot, arcKey)
    outFs.mkdirs(arcPath.getParent)
    // stream into a tmp key and rename in only after a COMPLETE
    // archive: a failure mid-walk would otherwise leave a valid gzip
    // of a truncated tar at the published key (the finally-close
    // writes a clean gzip trailer no matter what), which consumers
    // would unpack as a silently partial model
    val arcTmp = new HPath(arcPath.getParent, s".${arcPath.getName}.tmp")
    try {
      val gz = new java.util.zip.GZIPOutputStream(outFs.create(arcTmp, true))
      try {
        walk(f, new HPath(modelDir)).foreach { case (rel, p, size) =>
          val in = f.open(p)
          try Tar.writeEntry(gz, rel, size, now.getEpochSecond, in)
          finally in.close()
        }
        Tar.finish(gz)
      } finally gz.close()
      if (!outFs.rename(arcTmp, arcPath))
        throw new java.io.IOException(s"archive publish rename $arcTmp -> $arcPath failed")
    } catch {
      case e: Throwable => outFs.delete(arcTmp, false); throw e
    }
    // copy archive → latest via tmp + OVERWRITE rename: `latest` is the
    // key consumers poll, so it must never be absent or partial. A
    // truncate-then-stream overwrite exposes a partial artifact during
    // the copy; a delete-then-rename leaves a missing-key window and —
    // if the rename then fails — no artifact AT ALL. FileContext.rename
    // with Options.Rename.OVERWRITE replaces the destination atomically
    // on HDFS/local. (On an object store a publisher would instead PUT
    // the latest key directly — the PUT itself is atomic there.)
    val latest = new HPath(modelsRoot, latestKey(modelName))
    outFs.mkdirs(latest.getParent)
    val tmp = new HPath(latest.getParent, s".${latest.getName}.tmp")
    val in = outFs.open(arcPath)
    val out = outFs.create(tmp, true)
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024, true)
    catch { case e: Exception => in.close(); out.close(); throw e }
    org.apache.hadoop.fs.FileContext.getFileContext(latest.toUri, outFs.getConf)
      .rename(tmp, latest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    (arcKey, latestKey(modelName))
  }

  /** Extract `models/latest/{name}.tar.gz` into destDir (the inverse
    * of publish); returns false when no published artifact exists.
    * destDir is CLEARED first — consumers re-unpack each new artifact
    * into the same directory, and leftover part-files from a previous
    * artifact would otherwise mix into the MLlib directory-load (which
    * reads every parquet file present) as a silently wrong model.
    */
  def unpackLatest(modelsRoot: String, modelName: String, destDir: String): Boolean = {
    val f = fs(modelsRoot)
    val latest = new HPath(modelsRoot, latestKey(modelName))
    if (!f.exists(latest)) return false
    val destFs = fs(destDir)
    // extract into a side dir and swap AFTER the whole archive reads
    // cleanly — deleting the working model first would leave the
    // consumer with nothing if the artifact turns out truncated or
    // corrupt (the one failure a model-refresh path must survive)
    val dest = new HPath(destDir)
    val tmp = new HPath(dest.getParent,
      s".${dest.getName}.tmp-${java.util.UUID.randomUUID()}")
    val in = new java.util.zip.GZIPInputStream(f.open(latest))
    try {
      Tar.read(in, (name, _, data) => {
        // tar entry names come from the (possibly hostile) archive:
        // reject anything that could escape the destination (zip-slip)
        require(!name.startsWith("/") && !name.split('/').contains(".."),
          s"unsafe tar entry name: $name")
        val p = new HPath(tmp, name)
        destFs.mkdirs(p.getParent)
        val out = destFs.create(p, true)
        try org.apache.hadoop.io.IOUtils.copyBytes(data, out, 64 * 1024, false)
        finally out.close()
      })
    } catch {
      case e: Throwable => destFs.delete(tmp, true); throw e
    } finally in.close()
    swapIn(destFs, tmp, dest)
    true
  }

  def loadDecisionModel(spark: SparkSession, dir: String): Option[DecisionModel] = {
    val metaText = readString(dir, "metadata.json").getOrElse(return None)
    try {
      val meta = CanonicalJson.parse(metaText)
      val names = (0 until meta.get("feature_names").size())
        .map(meta.get("feature_names").get(_).textValue())
      val tablesNode = meta.get("string_tables")
      val tables = scala.jdk.CollectionConverters.IteratorHasAsScala(tablesNode.fieldNames())
        .asScala.map { f =>
          val arr = tablesNode.get(f)
          f -> (0 until arr.size()).map(arr.get(_).longValue()).toSeq
        }.toMap
      Some(DecisionModel(
        GBTRegressionModel.load(s"$dir/model"), names, tables,
        meta.get("model_seed").longValue(),
        meta.get("reward_mean").doubleValue(), meta.get("reward_std").doubleValue(),
        readBytes(dir, Boosters.NativeBoosterFile)))
    } catch { case _: Exception => None }
  }
}
