package graft.core

/** Named word-hash functions for SimHash fingerprints. A sealed enum
  * rather than an arbitrary `String => Long`: the hash rides a
  * Catalyst expression (`SimHashExpression`) as expression data, where
  * a closure degrades case-class equality / plan canonicalization to
  * reference identity and can smuggle non-serializable capture that
  * fails only at plan-ship time. Case objects have value equality,
  * trivially serializable identity, and still compose as functions
  * (the trait extends `String => Long`).
  */
sealed trait WordHash extends (String => Long) with Serializable

object WordHash {

  /** XXH3-64 (seed 0): fast, high quality — the default. */
  case object Xxh3 extends WordHash {
    override def apply(w: String): Long = XxHash3.hash(w, 0L)
  }

  /** MD5-nibble hash: nibble j is hex char j of md5(word), bit i is
    * bit (i % 4) of nibble (i / 4) — chosen because BOTH Spark and
    * DuckDB expose md5, so a SQL oracle reproduces the simhash
    * bit-for-bit (XXH3 is not SQL-expressible). Same statistical
    * quality for simhash purposes; ~3× slower per word.
    */
  case object Md5 extends WordHash {
    private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

    override def apply(w: String): Long = {
      val md = md5Digest.get()
      md.reset()
      val d = md.digest(w.getBytes("UTF-8"))
      var h = 0L
      var j = 0
      while (j < 16) {
        val b = d(j / 2) & 0xff
        val nib = if (j % 2 == 0) b >>> 4 else b & 0xf
        h |= nib.toLong << (4 * j)
        j += 1
      }
      h
    }
  }
}
