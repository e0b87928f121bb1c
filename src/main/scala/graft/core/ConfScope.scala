package graft.core

import org.apache.spark.sql.SparkSession

/** Scoped session-conf overrides — set, run, restore. */
private[graft] object ConfScope {

  /** Run `body` under a fixture-scale shuffle width. Every stateful
    * micro-batch commits one state store per shuffle partition, and
    * every aggregation exchange schedules one task per partition — on
    * gate-sized fixtures (10⁵ rows, hundreds of keys) a 32-wide
    * session pays mostly scheduling/commit overhead that a production
    * run at real data volumes would amortize. Results are exact and
    * hash-identical at any width; the surrounding session's own
    * setting is restored on exit.
    */
  def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val old = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, old)
  }
}
