package graft.core

/** String-table target encoding, mirroring the reference
  * (src/trainer/code/feature_encoder.py:171-226 and
  * string_encoder.py:83-101).
  *
  * Build time: strings are ranked by Bayesian mean target (descending)
  * and hashed with xxh3 masked to the smallest bit width that yields no
  * collisions. Encode time: a string hashes into the table and maps to
  * a value in [-1, 1] by rank (best rank → +1); misses map to a
  * deterministic pseudo-random value in [-missWidth/2, +missWidth/2]
  * derived from the low 32 hash bits (so unseen strings disperse
  * instead of colliding at one value).
  */
final class StringTable(hashTable: Seq[Long], modelSeed: Long) extends Serializable {
  require(modelSeed >= 0, "xxh3 seed must be a non-negative 64-bit value")

  val mask: Long = StringTable.maskFor(hashTable)
  private val maxPosition = hashTable.length - 1
  // single-entry / empty tables get miss width 1 → range [-0.5, 0.5];
  // 2/maxPosition keeps misses from overlapping non-zero table values
  val missWidth: Double = if (maxPosition < 1) 1.0 else 2.0 / maxPosition

  private val valueTable: Map[Long, Double] =
    hashTable.reverse.zipWithIndex.map { case (h, idx) =>
      h -> (if (maxPosition == 0) 1.0 else StringTable.scale(idx.toDouble / maxPosition))
    }.toMap

  def encode(s: String): Double = {
    val h = XxHash3.hash(s, modelSeed)
    valueTable.get(h & mask) match {
      case Some(v) => v
      case None => encodeMiss(h)
    }
  }

  def encodeMiss(stringHash: Long): Double =
    // 32-bit mask for portability to 32-bit client runtimes
    StringTable.scale((stringHash & 0xffffffffL) * math.pow(2, -32), missWidth)
}

object StringTable {

  /** map val∈[0,1] to [-width/2, +width/2]. */
  def scale(v: Double, width: Double = 2.0): Double = v * width - 0.5 * width

  /** Mask covering the most significant bit of the largest table hash. */
  def maskFor(hashTable: Seq[Long]): Long = {
    if (hashTable.isEmpty) return 0L
    val max = hashTable.max
    if (max == 0L) 0L
    else (1L << (64 - java.lang.Long.numberOfLeadingZeros(max))) - 1
  }

  /** Masked hash used at build time. Note the reference masks with
    * n_bits+1 bits (string_encoder.py:96-101) — replicated exactly.
    */
  def hash(s: String, nBits: Int, seed: Long): Long = {
    require(nBits > 0 && nBits < 64)
    // nBits = 63 needs all 64 bits: (1L << 64) is a mod-64 shift in
    // Java (== 1L), whose mask would zero every hash
    val mask = if (nBits >= 63) -1L else (1L << (nBits + 1)) - 1
    XxHash3.hash(s, seed) & mask
  }

  /** Find the smallest bit width whose masked hashes are collision-free
    * for `sortedStrings` (ranked best-first), and return those hashes
    * in rank order (string_encoder.py:83-92).
    */
  def buildHashTable(sortedStrings: Seq[String], seed: Long): Seq[Long] = {
    if (sortedStrings.isEmpty) return Seq.empty
    val start = math.max((math.log(sortedStrings.length) / math.log(2)).toInt, 1)
    var nBits = start
    while (nBits < 64) {
      val hashes = sortedStrings.map(hash(_, nBits, seed))
      if (hashes.distinct.length == sortedStrings.length) return hashes
      nBits += 1
    }
    throw new IllegalStateException("no collision-free bit width below 64")
  }
}
