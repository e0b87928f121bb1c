package graft.operators

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession

/** Shared machinery for disk-materialized index tables with small
  * JSON sidecars ([[IvfIndex]] cells + centroids/codebook,
  * [[InvertedIndex]] postings + meta). ONE home for the atomic
  * build-and-swap protocol: it is crash-safety-critical, and two
  * drifting copies would let the indexes' durability guarantees
  * silently diverge.
  */
private[operators] object SidecarIndex {

  def fs(dir: String) = {
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    new HPath(dir).getFileSystem(conf)
  }

  /** Write `content` as a small sidecar file under dir. */
  def writeSidecar(dir: String, name: String, content: String): Unit = {
    val out = fs(dir).create(new HPath(dir, name), true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** Read a sidecar file fully as UTF-8. */
  def readSidecar(dir: String, name: String): String = {
    val in = fs(dir).open(new HPath(dir, name))
    try new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
    finally in.close()
  }

  /** Build the whole index (table + sidecars) in a side directory,
    * then swap it in. Writing pieces in place would let a failed
    * rebuild pair NEW table data with an OLD sidecar — load() would
    * accept the mismatch and queries would silently be wrong.
    *
    * Never delete-then-rename: move the previous build aside, swap
    * the new one in, THEN drop the old — every crash window leaves
    * either the old or the new build live at `dir` (load on none
    * fails loudly), and a failed swap restores the old instead of
    * destroying it.
    */
  def buildAtomically(dir: String)(writeTo: String => Unit): Unit = {
    val root = new HPath(dir)
    val f = fs(dir)
    val uuid = java.util.UUID.randomUUID()
    val tmp = new HPath(root.getParent, s".${root.getName}.tmp-$uuid")
    try writeTo(tmp.toString)
    catch { case e: Throwable => f.delete(tmp, true); throw e }
    f.mkdirs(root.getParent)
    val old = new HPath(root.getParent, s".${root.getName}.old-$uuid")
    val hadOld = f.exists(root)
    if (hadOld && !f.rename(root, old))
      throw new java.io.IOException(s"index swap: move-aside of $root failed")
    if (!f.rename(tmp, root)) {
      if (hadOld) f.rename(old, root)
      f.delete(tmp, true)
      throw new java.io.IOException(s"index swap $tmp -> $root failed")
    }
    if (hadOld) f.delete(old, true)
  }
}
