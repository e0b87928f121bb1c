package graft.operators

import org.apache.spark.sql.DataFrame

/** The persist-and-return contract, in ONE place.
  *
  * Several operators persist a corpus-sized intermediate, derive a
  * bounded result from it, and must release the big cache before
  * returning. The result has to be materialized BEFORE that release
  * (or the release would force a recomputation of the whole upstream
  * on first use), so it comes back to the caller persisted.
  *
  * THE CALLER OWNS THE RETURNED CACHE: call `.unpersist()` on the
  * returned DataFrame when done with it in a long-lived session —
  * until then it counts against storage memory like any cached
  * relation. Every operator that returns a persisted frame routes
  * through [[handOff]] so the contract is greppable and uniform
  * (DedupSpec/BasketSpec assert a drain-and-release cycle leaves zero
  * cached blocks).
  */
private[graft] object Caching {

  /** Persist `df`, materialize it fully, and hand ownership of the
    * cache to the caller.
    */
  def handOff(df: DataFrame): DataFrame = {
    df.persist()
    df.count()
    df
  }
}
