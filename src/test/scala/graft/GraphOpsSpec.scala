package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.GraphOps

/** Triangle census correctness: the degree-ordered oriented wedge join must
  * equal the naive closed-wedge definition on graphs with known counts,
  * independent of partitioning, and ignore structures that look like
  * triangles but aren't (stars, pendants, isolated nodes).
  */
class GraphOpsSpec extends AnyFunSuite {

  lazy val spark = TestSpark.session

  private def census(nodes: Seq[Long], und: Seq[(Long, Long)],
                     nodeParts: Int = 1, edgeParts: Int = 1): Seq[(Long, Long)] = {
    import spark.implicits._
    val n = nodes.toDF("node").repartition(nodeParts)
    val e = und.toDF("a", "b").repartition(edgeParts)
    GraphOps.trianglePerNode(n, e)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
  }

  test("K4 + pendant + isolated: known per-node counts, partitioning-invariant") {
    // K4 on {1..4}: 4 triangles, every K4 node in exactly 3; node 5 is a
    // pendant off 1 (in none); node 6 is isolated.
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val expected = Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L), (5L, 0L), (6L, 0L))
    assert(census(nodes, und) == expected)
    assert(census(nodes, und, nodeParts = 7, edgeParts = 5) == expected)
  }

  test("star graph: the hub's wedges close nothing — zero triangles everywhere") {
    // Hub 1 — 2..12: deg(hub)=11 but every hub edge points INTO it after
    // orientation, so the deg² wedge blow-up never happens and no wedge closes.
    val nodes = (1L to 12L).toSeq
    val und = (2L to 12L).map(k => (1L, k))
    assert(census(nodes, und).forall(_._2 == 0L))
  }

  test("two triangles sharing an edge: shared endpoints count both") {
    // {1,2,3} and {2,3,4} share edge (2,3): nodes 2,3 in two triangles each.
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    assert(census(nodes, und) == Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("matches the naive closed-wedge count on an irregular graph") {
    import spark.implicits._
    // deterministic irregular graph over 1..60: chords +1, +2, +3, ×2
    val keys = (1L to 60L).toSeq
    val nodeSet = keys.toSet
    val und = keys.flatMap(k => Seq(k + 1, k + 2, k + 3, 2 * k).filter(b => nodeSet(b) && b > k).map(b => (k, b))).distinct
    val oriented = census(keys, und)
    // naive: per-node triangle membership from the a<b<c 3-join
    val e = und.toDF("a", "b")
    val e1 = e.select(col("a").as("x"), col("b").as("y"))
    val e2 = e.select(col("a").as("y"), col("b").as("z"))
    val e3 = e.select(col("a").as("x"), col("b").as("z"))
    val tri = e1.join(e2, "y").join(e3, Seq("x", "z"))
    val naive = tri.select(col("x").as("node"))
      .unionByName(tri.select(col("y").as("node")))
      .unionByName(tri.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("c"))
    val naiveMap = naive.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(oriented == keys.sorted.map(k => (k, naiveMap.getOrElse(k, 0L))))
    assert(oriented.map(_._2).sum % 3 == 0)  // every triangle counted at 3 corners
    assert(oriented.map(_._2).sum > 0)       // the graph actually has triangles
  }

  test("stress centrality: path counts exact on a path and a diamond (sigma doubles, f sums)") {
    import spark.implicits._
    def run(und: Seq[(Long, Long)], seedId: Long, rounds: Int) = {
      val e = und.toDF("a", "b")
      val seed = Seq(seedId).toDF("node")
      GraphOps.stressCentrality(seed, e, rounds).collect()
        .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
    }
    // path 1-2-3-4 from 1: sigma = 1 everywhere, f counts remaining
    // suffixes, through(v) = sigma*f decreases toward the end
    val path = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), 1L, rounds = 3)
    assert(path(1L) == ((0, 1L, 4L, 4L)))
    assert(path(2L) == ((1, 1L, 3L, 3L)))
    assert(path(3L) == ((2, 1L, 2L, 2L)))
    assert(path(4L) == ((3, 1L, 1L, 1L)))
    // diamond 1-{2,3}-4: two shortest paths meet at the sink (sigma(4)=2);
    // the source's f counts all 5 suffixes (itself, 2, 3, and 4 twice)
    val dia = run(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), 1L, rounds = 2)
    assert(dia(4L) == ((2, 2L, 1L, 2L)))
    assert(dia(2L) == ((1, 1L, 2L, 2L)))
    assert(dia(3L) == ((1, 1L, 2L, 2L)))
    assert(dia(1L) == ((0, 1L, 5L, 5L)))
  }

  test("integer HITS: star hub concentrates hub mass, leaves split authority; partitioning-invariant") {
    import spark.implicits._
    // directed star 1 -> {2,3,4}: after any round, node 1 is the only hub
    // (all authority flows back to it) and 2/3/4 split authority equally
    for (parts <- Seq(1, 3)) {
      val n = Seq(1L, 2L, 3L, 4L).toDF("node").repartition(parts)
      val e = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("src", "dst").repartition(parts)
      val r = GraphOps.hitsInteger(n, e, iters = 2)
        .orderBy("node").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
      val byNode = r.map(t => t._1 -> (t._2, t._3)).toMap
      assert(byNode(1L)._1 == 0L, s"parts=$parts: the hub receives no authority: $r")
      assert(byNode(1L)._2 == 1000000L, s"parts=$parts: all hub mass at node 1: $r")
      assert(Seq(2L, 3L, 4L).forall(v => byNode(v)._1 == 333333L),
        s"parts=$parts: leaves split authority 1e6 div 3: $r")
      assert(Seq(2L, 3L, 4L).forall(v => byNode(v)._2 == 0L),
        s"parts=$parts: leaves have no out-edges, zero hub mass: $r")
    }
  }

  test("label propagation: disconnected cliques converge to one min label each, partitioning-invariant") {
    import spark.implicits._
    // two K4s with no bridge: by round 2 every member holds the clique
    // minimum (round 1 sends the min everywhere except the min node
    // itself, which flips back once the majority carries it)
    val und = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (11L, 12L), (11L, 13L), (11L, 14L), (12L, 13L), (12L, 14L), (13L, 14L))
    val nodes = (Seq(1L, 2L, 3L, 4L) ++ Seq(11L, 12L, 13L, 14L)).toDF("node")
    for (parts <- Seq(1, 7)) {
      val labels = graft.ops.GraphOps.labelPropagation(
          nodes, und.toDF("a", "b").repartition(parts), rounds = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(Seq(1L, 2L, 3L, 4L).forall(labels(_) == 1L), s"parts=$parts: $labels")
      assert(Seq(11L, 12L, 13L, 14L).forall(labels(_) == 11L), s"parts=$parts: $labels")
    }
  }

  test("modularity census: two triangles + bridge, hand-computed exact contributions") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by bridge (3,4): m = 7,
    // each community has L_c = 3 intra edges and degree sum 2+2+3 = 7,
    // so contrib = (4·7·3 − 7²) / (4·7²) = 35/196 → ⌊1e6·35/196⌋ = 178571
    // and Q = 2·35/196 = 0.357…
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "label")
    for (parts <- Seq(1, 5)) {
      val rows = GraphOps.modularityCensus(und.repartition(parts), labels)
        .orderBy(col("label")).collect()
      assert(rows.length == 2)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_nodes") == 3L)
        assert(r.getAs[Long]("degree_sum") == 7L)
        assert(r.getAs[Long]("intra_edges") == 3L)
        assert(r.getAs[Long]("m_edges") == 7L)
        assert(r.getAs[Long]("contrib_e6") == 178571L, s"parts=$parts: $r")
      }
    }
  }

  test("modularity census: everything in one community scores zero; singleton communities go negative") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("a", "b")
    // one community holding the whole graph: L_c = m and d_c = 2m, so
    // contrib = (4m·m − 4m²)/4m² = 0 exactly
    val one = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("node", "label")
    val all = GraphOps.modularityCensus(und, one).collect()
    assert(all.length == 1 && all.head.getAs[Long]("contrib_e6") == 0L)
    // singletons: L_c = 0, d_c = 2 → contrib = −4/(4·9) = −1/9 → sign-split
    // floor −111111 (truncation toward zero on the negated magnitude)
    val singles = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("node", "label")
    val rows = GraphOps.modularityCensus(und, singles).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Long]("intra_edges") == 0L))
    assert(rows.forall(_.getAs[Long]("contrib_e6") == -111111L))
  }

  test("conductance census: bridge communities read 1/7, whole-graph community reads 0") {
    import spark.implicits._
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L),
      (3L, 4L)).toDF("a", "b")
    val two = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node", "label")
    val rows = GraphOps.conductanceCensus(und, two)
      .orderBy(col("label")).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      // each triangle+bridge-endpoint community: vol 7, one cut edge,
      // den = min(7, 14-7) = 7 → ⌊1e6/7⌋ = 142857
      assert(r.getAs[Long]("vol") == 7L)
      assert(r.getAs[Long]("cut_edges") == 1L)
      assert(r.getAs[Long]("conductance_e6") == 142857L, s"$r")
    }
    // the whole graph as one community: cut 0 and den 0 → 0 by convention
    val one = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("node", "label")
    val all = GraphOps.conductanceCensus(und, one).collect()
    assert(all.length == 1 && all.head.getAs[Long]("cut_edges") == 0L &&
      all.head.getAs[Long]("conductance_e6") == 0L)
  }
}
