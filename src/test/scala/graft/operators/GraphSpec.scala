package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestBase

class GraphSpec extends AnyFunSuite with SparkTestBase {

  test("pageRankInt matches the hand-computed integer iteration on a 3-node graph") {
    import spark.implicits._
    // a -> b (w 2), a -> c (w 1), b -> c (w 1), c -> a (w 1)
    val edges = Seq(("a", "b", 2L), ("a", "c", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRankInt(edges, "src", "dst", "w",
        iterations = 2, scale = 900L, dampNum = 85L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // hand-run of the documented recurrence at scale=900, N=3, base =
    // (15*900) div 300 = 45, r0 = 300 each:
    // round 1: contribs a<-c: (300*1)div1=300; b<-a: (300*2)div3=200;
    //          c<-a: (300*1)div3=100, c<-b: (300*1)div1=300 -> sum 400
    // r1: a = 45 + (85*300)div100 = 45+255 = 300
    //     b = 45 + (85*200)div100 = 45+170 = 215
    //     c = 45 + (85*400)div100 = 45+340 = 385
    // round 2: a<-c: 385; b<-a: (300*2)div3=200; c<-a: 100, c<-b: 215 -> 315
    // r2: a = 45 + (85*385)div100 = 45+327 = 372
    //     b = 45 + 170 = 215
    //     c = 45 + (85*315)div100 = 45+267 = 312
    assert(got === Map("a" -> 372L, "b" -> 215L, "c" -> 312L))
  }

  test("pageRankInt is bit-identical across partition layouts and runs") {
    import spark.implicits._
    val edges = (1 to 400).map { i =>
      (s"n${i % 23}", s"n${(i * 7) % 23}", (i % 5 + 1).toLong)
    }.toDF("src", "dst", "w")
    def run(parts: Int): Map[String, Long] =
      Graph.pageRankInt(edges.repartition(parts), "src", "dst", "w", iterations = 4)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val a = run(1)
    val b = run(7)
    assert(a === b)
    // ranks sum to <= scale (dangling/rounding mass only leaks DOWN)
    assert(a.values.sum <= 1000000000L)
    assert(a.values.forall(_ > 0))
  }

  test("sink-only and source-only nodes are ranked; guards reject bad input") {
    import spark.implicits._
    val edges = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val got = Graph.pageRankInt(edges, "src", "dst", "w", iterations = 1,
        scale = 1000L, dampNum = 50L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // N=2, base = (50*1000) div 200 = 250, r0 = 500
    // a gets no in-links: 250; b: 250 + (50*500)div100 = 500
    assert(got === Map("a" -> 250L, "b" -> 500L))

    intercept[IllegalArgumentException](
      Graph.pageRankInt(edges, "src", "dst", "w", iterations = 0))
    intercept[IllegalArgumentException](
      Graph.pageRankInt(edges, "src", "dst", "w", dampNum = 101L))
    intercept[IllegalArgumentException](
      Graph.pageRankInt(Seq(("a", "b", 0L)).toDF("src", "dst", "w"), "src", "dst", "w"))
    // overflow precondition: scale x max out-weight must fit in a long
    intercept[IllegalArgumentException](
      Graph.pageRankInt(Seq(("a", "b", Long.MaxValue / 100)).toDF("src", "dst", "w"),
        "src", "dst", "w", scale = 1000L))
  }

  test("randomized differential: pageRankInt equals an in-memory integer reference") {
    import spark.implicits._
    // independent reference implementation of the documented recurrence
    def reference(edges: Seq[(String, String, Long)], iters: Int,
        scale: Long, damp: Long): Map[String, Long] = {
      val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
      val n = nodes.size
      val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
      val base = ((100L - damp) * scale) / (100L * n)
      var r = nodes.map(_ -> scale / n).toMap
      for (_ <- 1 to iters) {
        val contrib = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
        for ((s, d, w) <- edges)
          contrib(d) += (r(s) * w) / outw(s)
        r = nodes.map(nd => nd -> (base + (damp * contrib(nd)) / 100L)).toMap
      }
      r
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nNodes = 5 + rnd.nextInt(15)
      val edges = (1 to 30 + rnd.nextInt(60)).map { _ =>
        (s"n${rnd.nextInt(nNodes)}", s"n${rnd.nextInt(nNodes)}", (1 + rnd.nextInt(9)).toLong)
      }.distinct
      val iters = 1 + rnd.nextInt(5)
      val got = Graph.pageRankInt(edges.toDF("src", "dst", "w"), "src", "dst", "w",
          iterations = iters, scale = 1000000L, dampNum = 85L)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === reference(edges, iters, 1000000L, 85L), s"trial $trial")
    }
  }

  test("transitions builds the per-user consecutive-type edge relation deterministically") {
    import spark.implicits._
    val ev = Seq(
      // user 1 timeline: x(t1) y(t2) x(t3); user 2: y(t1) y(t1 tie by id) x(t2)
      (1L, 10L, "x", 1L), (2L, 10L, "y", 2L), (3L, 10L, "x", 3L),
      (4L, 20L, "y", 1L), (5L, 20L, "y", 1L), (6L, 20L, "x", 2L))
      .toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", timestamp_seconds(col("t")))
    val got = Graph.transitions(ev, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // user1: x->y, y->x; user2 (ties broken by event_id 4 then 5): y->y, y->x
    assert(got === Map(("x", "y") -> 1L, ("y", "x") -> 2L, ("y", "y") -> 1L))
  }

  test("triangleCensus on known graphs: triangle, square, K4, disjoint edge") {
    import spark.implicits._
    def census(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val r = Graph.triangleCensus(edges.toDF("a", "b"), "a", "b").head()
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // K3: 3 nodes, 3 edges, 3 wedges (each node degree 2), 1 triangle
    assert(census(Seq((1L, 2L), (1L, 3L), (2L, 3L))) === ((3L, 3L, 3L, 1L)))
    // C4 (square): 4 wedges, 0 triangles
    assert(census(Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))) ===
      ((4L, 4L, 4L, 0L)))
    // K4: every node degree 3 -> 4*C(3,2)=12 wedges, C(4,3)=4 triangles
    assert(census(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L))) === ((4L, 6L, 12L, 4L)))
    // K3 plus a disjoint edge: wedges/triangles unchanged, counts grow
    assert(census(Seq((1L, 2L), (1L, 3L), (2L, 3L), (8L, 9L))) ===
      ((5L, 4L, 3L, 1L)))
  }

  test("randomized differential: triangleCensus equals brute-force enumeration") {
    import spark.implicits._
    for (seed <- Seq(5, 6, 7)) {
      val rnd = new scala.util.Random(seed)
      // G(n, m) with duplicates filtered to the canonical a < b form —
      // includes high-degree hubs (node 0 biased) to exercise the
      // degree orientation
      val edges = (1 to 300).map { _ =>
        val a = if (rnd.nextInt(4) == 0) 0L else rnd.nextInt(30).toLong
        val b = rnd.nextInt(30).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(e => e._1 != e._2).distinct
      val r = Graph.triangleCensus(edges.toDF("a", "b"), "a", "b").head()
      val eset = edges.toSet
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val deg = nodes.map(n => edges.count(e => e._1 == n || e._2 == n))
      val wedges = deg.map(d => d.toLong * (d - 1) / 2).sum
      val tris = (for {
        x <- nodes; y <- nodes if x < y; z <- nodes if y < z
        if eset((x, y)) && eset((x, z)) && eset((y, z))
      } yield 1).size.toLong
      assert(r.getLong(0) === nodes.size.toLong, s"seed $seed nodes")
      assert(r.getLong(1) === edges.size.toLong, s"seed $seed edges")
      assert(r.getLong(2) === wedges, s"seed $seed wedges")
      assert(r.getLong(3) === tris, s"seed $seed triangles")
    }
  }

  test("cooccurrenceEdges builds canonical weighted pair relation, bounded per group") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L), (1L, 20L), (1L, 30L), (1L, 10L), // dup item in group 1
      (2L, 20L), (2L, 10L),
      (3L, 40L)) // singleton group -> no edges
      .toDF("g", "item")
    val got = Graph.cooccurrenceEdges(df, "g", "item")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      (10L, 20L) -> 2L, // groups 1 and 2
      (10L, 30L) -> 1L,
      (20L, 30L) -> 1L))
  }
}
