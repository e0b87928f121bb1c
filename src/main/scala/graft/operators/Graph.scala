package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph ranking over a weighted edge relation — the
  * source-authority step of web-corpus curation (Common Crawl domain
  * ranking à la harmonic-centrality / PageRank lists, used to weight
  * or gate sources before sampling). The graph is DERIVED — typically
  * a domain/source transition or citation relation aggregated out of
  * a 100 TB event or link log — so the expensive part is the edge
  * aggregation (one shuffle), while the power iteration runs over the
  * much smaller node/edge relations.
  *
  * All iteration arithmetic is INTEGER-scaled (ranks are longs in
  * units of 1/`scale`): sums of longs are exact and associative, so
  * the result is bit-identical across partition layouts, task
  * retries, AND engines — no floating-point accumulation-order drift,
  * which matters because rank iteration compounds round-off across
  * rounds. Truncating integer division (`div`, both operands
  * positive) is pinned to the same floor semantics in Spark and the
  * DuckDB oracle.
  */
object Graph {

  /** PageRank with damping `dampNum`/100 for `iterations` rounds over
    * `edges` (`srcCol`, `dstCol`, long weight `wCol` > 0). Returns
    * (node, r) with r in units of 1/`scale`.
    *
    * r₀ = scale div N;
    * rₜ₊₁(j) = (100−d)·scale div (100·N)
    *           + d · Σᵢ (rₜ(i)·w(i,j) div outw(i)) div 100.
    *
    * Dangling mass (nodes with no out-edges) is dropped, not
    * redistributed — ranks then sum to ≤ scale, which is fine for the
    * ORDERING/weighting use and keeps every step a single join+agg.
    *
    * Overflow precondition: scale · max(rank_sum, max edge weight)
    * must stay under 2⁶³ — with the default scale 1e9 that allows
    * per-edge weights up to ~9e9. Checked against the max out-weight.
    *
    * Scale shape: each round is ONE hash-partitioned join (edges ⋈
    * ranks on src) + partial/final long-sum agg + a left join back to
    * the node list. `ranks` is referenced ONCE per round, so lineage
    * grows linearly (unlike q_dedup_clusters' twice-referenced labels,
    * which double per round) — no per-round materialization needed;
    * `checkpointEvery` bounds analyzer cost on long horizons.
    */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, iterations: Int = 5, scale: Long = 1000000000L,
      dampNum: Long = 85L, checkpointEvery: Int = 10): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(dampNum >= 0 && dampNum <= 100, s"damping must be in [0,100], got $dampNum")
    require(scale > 0, s"scale must be positive, got $scale")
    // materialize the (already aggregated, graph-sized — NOT log-sized)
    // edge relation once: it is consumed iterations+2 times (node set,
    // overflow probe, every round's join); without this each action
    // re-derives the upstream extraction over the full log
    val e0 = edges.select(
      col(srcCol).as("_src"), col(dstCol).as("_dst"),
      col(wCol).cast("long").as("_w")).localCheckpoint()
    val nodes = e0.select(col("_src").as("node"))
      .union(e0.select(col("_dst").as("node"))).distinct()
      .localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty edge relation")
    // per-EDGE validation, not an aggregate proxy: a zero/negative/null
    // weight hidden behind a positive max would divide-by-zero (ANSI)
    // or silently corrupt ranks mid-iteration
    val badW = e0.filter(col("_w").isNull || col("_w") <= 0).count()
    require(badW == 0, s"$badW edges have null or non-positive weight")
    val outdeg = e0.groupBy("_src").agg(sum("_w").as("_outw"))
    val maxOutw = outdeg.agg(max("_outw")).head().getLong(0)
    require(maxOutw <= Long.MaxValue / scale,
      s"scale=$scale x max out-weight=$maxOutw would overflow 64-bit rank math")
    val e = e0.join(outdeg, "_src")
    val base = ((100L - dampNum) * scale) / (100L * n)
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    var ranks = nodes.withColumn("r", lit(scale / n))
    for (i <- 1 to iterations) {
      val contrib = e.join(ranks, e("_src") === ranks("node"))
        .select(col("_dst").as("node"),
          expr("(r * _w) div _outw").as("_c"))
        .groupBy("node").agg(sum("_c").as("_cs"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampNum * coalesce(_cs, 0L)) div 100")).as("r"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** The edge-extraction half for event logs: consecutive event-type
    * transitions within each user's timeline (`lead` over user
    * sessions, deterministic `tsCol, idCol` order), aggregated to a
    * weighted (src, dst, w) relation. ONE window pass + ONE shuffle on
    * the (src, dst) pair — the part that actually touches the 100 TB.
    */
  def transitions(events: DataFrame, userCol: String, typeCol: String,
      tsCol: String, idCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_dst", lead(col(typeCol), 1).over(w))
      .filter(col("_dst").isNotNull)
      .groupBy(col(typeCol).as("src"), col("_dst").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Co-occurrence edge extraction for basket-shaped logs: an
    * undirected edge (a, b), a < b, for every pair of distinct
    * `itemCol` values sharing a `groupCol` value, weighted by the
    * number of co-occurring groups. The pair generation is a
    * per-group self-join, so its cost is Σ groupsize² — bounded by
    * the largest GROUP (an order's line count, a session's length),
    * never the corpus; the same fan-in contract as the basket
    * association operator.
    */
  def cooccurrenceEdges(df: DataFrame, groupCol: String,
      itemCol: String): DataFrame = {
    val items = df.select(col(groupCol).as("_g"), col(itemCol).as("_i"))
      .distinct()
    val a = items.select(col("_g"), col("_i").as("a"))
    val b = items.select(col("_g"), col("_i").as("b"))
    a.join(b, Seq("_g")).filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
  }

  /** Exact triangle count plus wedge census over an undirected edge
    * relation (`aCol` < `bCol` canonical, no duplicates — the
    * [[cooccurrenceEdges]] contract). Returns one row:
    * (n_nodes, n_edges, n_wedges, n_triangles). The global clustering
    * coefficient is 3·triangles / wedges — left to the caller as the
    * two exact integers so no cross-engine float division happens
    * here.
    *
    * Scale shape: edge-iterator with degree orientation and
    * ADJACENCY-ARRAY intersection. Edges are oriented by a TOTAL
    * degree order (degree, then node id) so every triangle is counted
    * exactly once from its lowest node, and the orientation bounds
    * out-degree by O(√m) on any graph (a high-degree hub receives
    * edges instead of emitting them). Each oriented edge (u, v)
    * contributes |N⁺(u) ∩ N⁺(v)| triangles: the out-adjacency is one
    * keyed collect (per-node arrays O(√m) by the bound), each edge
    * picks up both endpoint arrays through two co-partitioned joins,
    * and the intersection runs INSIDE codegen (array_intersect's hash
    * set) — so the exchanges move O(m) edge/adjacency rows, never the
    * Σ outdeg² wedge relation (the previous formulation materialized
    * and re-shuffled every wedge; at the x10 stress graph that is
    * ~20× the edge count). No driver state, no adjacency broadcast.
    */
  def triangleCensus(edges: DataFrame, aCol: String,
      bCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      // consumed five times below (degrees, counts, orientation ×2,
      // close); without pinning, each action re-derives the upstream
      // extraction over the full log
      .localCheckpoint()
    // degrees are consumed FOUR times (node census, wedge census, and
    // both orientation joins) — pin them too, or each consumer re-runs
    // the union+agg exchange over the edge list
    val deg = e.select(col("a").as("n")).union(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .localCheckpoint()
    // node + wedge census in ONE pass over the pinned degrees
    // (wedges from UNORIENTED degrees: Σ C(d, 2))
    val censusRow = deg.agg(
      count(lit(1)).as("_n"),
      sum(expr("d * (d - 1) div 2")).as("_w")).head()
    val nNodes = censusRow.getLong(0)
    val nWedges = if (censusRow.isNullAt(1)) 0L else censusRow.getLong(1)
    val nEdges = e.count()
    // orient low → high in (degree, id) order
    val dA = deg.select(col("n").as("a"), col("d").as("_da"))
    val dB = deg.select(col("n").as("b"), col("d").as("_db"))
    val oriented = e.join(dA, "a").join(dB, "b")
      .select(
        when(col("_da") < col("_db") ||
          (col("_da") === col("_db") && col("a") < col("b")),
          struct(col("a").as("lo"), col("b").as("hi")))
          .otherwise(struct(col("b").as("lo"), col("a").as("hi")))
          .as("_e"))
      .select(col("_e.lo").as("lo"), col("_e.hi").as("hi"))
      .localCheckpoint()
    // DATA-SCALED shuffle width (~100k edge rows per partition,
    // clamped to [session default, 4096]): on a real cluster the same
    // rule sizes the exchanges to the data, not to a config constant.
    val width = Math.min(4096L,
      Math.max(e.sparkSession.sessionState.conf.numShufflePartitions.toLong,
        nEdges / 100000L)).toInt
    // out-adjacency arrays, hash-partitioned on the node: the
    // explicit repartition both sizes the exchange and lets the
    // aggregation and the first join REUSE the partitioning (no
    // second exchange of the edge relation)
    val byLo = oriented.repartition(width, col("lo"))
    val adj = byLo.groupBy(col("lo"))
      .agg(collect_list(col("hi")).as("_nbrs"))
      .localCheckpoint() // consumed twice (both endpoint joins)
    // (u, v) ⋈ N⁺(u) on lo, then ⋈ N⁺(v) on hi (inner: a v with no
    // out-edges closes nothing); the per-edge triangle count is the
    // codegen'd array intersection — never a materialized wedge row
    val closed = byLo
      .join(adj.select(col("lo"), col("_nbrs").as("_nu")), Seq("lo"))
      .repartition(width, col("hi"))
      .join(adj.select(col("lo").as("hi"), col("_nbrs").as("_nv")),
        Seq("hi"))
      .select(size(array_intersect(col("_nu"), col("_nv")))
        .cast("long").as("_t"))
    val nTriangles = closed.agg(sum("_t")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val spark = edges.sparkSession
    import spark.implicits._
    Seq((nNodes, nEdges, nWedges, nTriangles))
      .toDF("n_nodes", "n_edges", "n_wedges", "n_triangles")
  }
}
