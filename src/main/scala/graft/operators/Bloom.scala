package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._

/** Bloom-filter join reduction — the classic 100 TB pattern for a
  * selective join: build a bloom filter over the SMALL side's keys
  * (one aggregate; filter bytes ≪ key set), ship it to every probe
  * task as a literal, and discard non-matching rows AT THE SCAN before
  * they reach the shuffle. The exact join afterwards removes the
  * bloom's false positives, so results are identical to the plain
  * join — only the shuffle volume changes (by the probe side's miss
  * rate, often 10-100× on selective joins).
  *
  * Spark's own `InjectRuntimeFilter` applies this automatically in
  * some shapes; this operator makes the reduction explicit and
  * predictable for the shapes the rule declines (pre-aggregated
  * probes, reused filters, multi-stage pipelines). It reuses Spark's
  * Catalyst bloom expressions — registered here under graft_ names
  * because the builtin registry does not expose them to SQL.
  */
object Bloom {

  private[operators] def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_bloom_agg",
      args => new BloomFilterAggregate(args(0), args(1), args(2)).toAggregateExpression(),
      "scala_udf")
    reg.createOrReplaceTempFunction("graft_bloom_might_contain",
      args => BloomFilterMightContain(args(0), args(1)),
      "scala_udf")
  }

  /** Build the filter bytes over `keys`' `keyCol`. `expectedItems`
    * sizes the filter (bits = items · bitsPerItem); the result stays
    * driver-bounded — 1M items × 8 bits ≈ 1 MB.
    */
  def buildFilter(keys: DataFrame, keyCol: String,
      expectedItems: Long, bitsPerItem: Long = 8): Option[Array[Byte]] = {
    ensureRegistered(keys.sparkSession)
    // BloomFilterAggregate rejects a non-positive estimate, and an
    // EMPTY build side aggregates to null bytes — both legal inputs
    // for a semi join (whose answer is simply empty), so normalize
    // rather than throw
    val items = math.max(1L, expectedItems)
    val bits = math.max(64L, items * bitsPerItem)
    Option(keys.select(call_function("graft_bloom_agg",
        xxhash64(col(keyCol)), lit(items), lit(bits)).as("bf"))
      .collect().head.getAs[Array[Byte]](0))
  }

  /** The probe-side predicate: true iff `keyCol` MAY be in the filter.
    * The filter bytes ride the plan as a literal, so every task
    * evaluates the membership test scan-side with no join.
    */
  def mightContain(spark: SparkSession, filter: Array[Byte], keyCol: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_bloom_might_contain", lit(filter), xxhash64(keyCol))
  }

  /** Semi-join `probe` against `build` with a bloom prefilter: the
    * bloom predicate prunes the probe side before its shuffle, the
    * exact left-semi join then removes false positives. Result ≡
    * `probe.join(build, keys, "left_semi")` (spec-asserted); shuffle
    * volume ≈ true matches + ε.
    */
  def semiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedItems: Long): DataFrame = {
    // xxhash64 is TYPE-sensitive where the exact join's equality
    // coerces: hashing int 5 on the probe and long 5 on the build
    // would silently prune true matches. Loud beats wrong — callers
    // cast one side.
    val pt = probe.schema(probeKey).dataType
    val bt = build.schema(buildKey).dataType
    require(pt == bt,
      s"semiJoin keys must share a type (xxhash64 is type-sensitive): " +
        s"$probeKey is ${pt.sql}, $buildKey is ${bt.sql}")
    val spark = probe.sparkSession
    // no distinct() on either path: the bloom aggregate and the
    // left_semi join both ignore duplicates, and each distinct was a
    // full extra exchange over the build side
    val bf = buildFilter(build.select(col(buildKey)), buildKey, expectedItems)
    val prefiltered = bf match {
      case Some(bytes) => probe.filter(mightContain(spark, bytes, col(probeKey)))
      case None        => probe // empty build side: the exact join yields empty
    }
    prefiltered
      .join(build.select(col(buildKey).as(probeKey)), Seq(probeKey), "left_semi")
  }
}
