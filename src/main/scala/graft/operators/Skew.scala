package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins: salting. A hot key that would pin one
  * reducer is spread over `salts` partitions by appending a random
  * salt to the big side's key and replicating the small side once per
  * salt value. AQE's skew-join split handles sort-merge cases
  * adaptively; explicit salting remains the tool when the small side
  * must be shuffled too (e.g. aggregation-after-join keeps the key) or
  * when AQE is unavailable.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salted `salts` ways.
    * Result columns = big.* ++ (small.* minus key).
    *
    * Inner/left joins only: a right/full outer join would emit one
    * null-extended row PER SALT for unmatched small-side keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      joinType: String = "inner", seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "leftouter", "leftsemi")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left-family joins only, got $joinType")
    require(!big.columns.contains("_salt") && !small.columns.contains("_salt"),
      "input already has a _salt column")
    // content-hash salt, same contract as saltedAgg: task retries
    // re-derive identical salts (rand() is order-dependent under
    // recomputation). Full-duplicate rows share a salt; a hot KEY
    // still spreads as long as its rows differ in any column.
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64((big.columns.map(col).toSeq :+ lit(seed)): _*),
        lit(salts)).cast("int"))
    val saltedSmall = small
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "_salt"), joinType).drop("_salt")
  }

  /** Salted aggregation for skewed group keys: two-phase — partial
    * aggregate on (key, salt), then final aggregate on key. `partial`
    * and `finalAgg` must compose (e.g. sum/sum, count/sum).
    *
    * The salt is a CONTENT hash (xxhash64 over all columns), not
    * rand(): task retries then re-derive identical salts, so a
    * recomputed partition can never double-count or drop rows
    * (rand() is order-dependent under recomputation). Rows that are
    * full duplicates share a salt; the hot KEY still spreads as long
    * as its rows differ in any column.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
      partial: Map[String, Column => Column], finalAgg: Map[String, Column => Column],
      seed: Long = 42L): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(partial.nonEmpty && finalAgg.nonEmpty, "aggregation maps must be non-empty")
    require(!df.columns.contains("_salt"), "input already has a _salt column")
    val salted = df.withColumn("_salt",
      pmod(xxhash64((df.columns.map(col).toSeq :+ lit(seed)): _*), lit(salts)).cast("int"))
    val phase1 = salted.groupBy(col(key), col("_salt"))
      .agg(partial.head._2(col(partial.head._1)).as(partial.head._1),
        partial.tail.map { case (c, f) => f(col(c)).as(c) }.toSeq: _*)
    phase1.groupBy(col(key))
      .agg(finalAgg.head._2(col(finalAgg.head._1)).as(finalAgg.head._1),
        finalAgg.tail.map { case (c, f) => f(col(c)).as(c) }.toSeq: _*)
  }
}
