package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation beyond connected components ([[Dedup]]'s
  * large-star/small-star CC): PageRank-style authority mass in EXACT
  * integer arithmetic, the link-authority signal CommonCrawl-scale
  * curation pipelines attach to documents (harmonic/PageRank centrality as
  * a URL-quality prior). Floating-point PageRank cannot be oracle-checked
  * (partial-aggregation order changes float sums); this formulation keeps
  * every quantity integral, so each iteration — and therefore the fixpoint
  * trajectory — is bit-identical across engines and partitionings.
  */
object GraphOps {

  /** Integer PageRank: every node starts with `initMass`; per iteration
    * each node sends `(dampNum · mass) div (100 · outdeg)` along every
    * out-edge (integer division — the damping factor dampNum/100 and the
    * equal split in one exact step) and every node restarts from
    * `baseMass` plus what it received. Dangling mass (leaves, rounding
    * residue) drains deterministically — the standard simplified PR; the
    * oracle mirrors it term for term.
    *
    * Scale shape: per iteration ONE (src-keyed) join of the rank table
    * against the degree-annotated edge list and one map-side-combined
    * groupBy(dst) — the textbook distributed PR step. Each round ends in
    * `localCheckpoint` (the [[Dedup.connectedComponentsStar]] convention)
    * so plan lineage stays O(1) in iterations instead of O(iters) — the
    * difference between 3 and 30 rounds surviving planning at 100 TB.
    *
    * @param nodes one `node` column, distinct
    * @param edges `src`/`dst` directed edges; mass flows src → dst
    */
  def pagerankInteger(nodes: DataFrame, edges: DataFrame, iters: Int,
                      initMass: Long = 1000000L, dampNum: Long = 85L,
                      baseMass: Long = 150000L): DataFrame = {
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = edges.join(outdeg, Seq("src"))
    var ranks = nodes.select(col("node"), lit(initMass).as("mass"))
    var i = 0
    while (i < iters) {
      val contribs = ranks
        .join(ed, ranks("node") === ed("src"))
        .select(col("dst").as("node"),
          expr(s"($dampNum * mass) div (100 * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(baseMass) + coalesce(col("in_mass"), lit(0L))).cast("long").as("mass"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Personalized (topic-sensitive) integer PageRank: identical exact-
    * integer contract to [[pagerankInteger]], but the restart mass flows
    * ONLY to the seed set — authority is measured relative to a trusted
    * seed neighborhood (the TrustRank/topic-PPR shape a curation pipeline
    * uses to score pages against a vetted domain list) instead of
    * uniformly. `seed` is a per-node predicate column; at scale the seed
    * set arrives as a broadcast-joined table producing the same boolean.
    */
  def pprInteger(nodes: DataFrame, edges: DataFrame, seed: org.apache.spark.sql.Column,
                 iters: Int, initMass: Long = 1000000L, dampNum: Long = 85L,
                 baseMass: Long = 150000L): DataFrame = {
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = edges.join(outdeg, Seq("src"))
    val restart = when(seed, lit(baseMass)).otherwise(lit(0L))
    var ranks = nodes.select(col("node"),
      when(seed, lit(initMass)).otherwise(lit(0L)).as("mass"))
    var i = 0
    while (i < iters) {
      val contribs = ranks
        .join(ed, ranks("node") === ed("src"))
        .select(col("dst").as("node"),
          expr(s"($dampNum * mass) div (100 * outdeg)").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes.select(col("node"))
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (restart + coalesce(col("in_mass"), lit(0L))).cast("long").as("mass"))
        .localCheckpoint(true)
      i += 1
    }
    ranks
  }

  /** Integer HITS (Kleinberg hubs & authorities) — [[pagerankInteger]]'s
    * two-score sibling, in the same exact-integer contract: per round,
    * authority(v) = Σ hub(u) over in-edges, hub(u) = Σ authority(v) over
    * out-edges, each rescaled to `scale` via `mass · scale div total`
    * (integer division against the round's total — a 1-row bounded
    * aggregate broadcast back, the watermark-scalar convention). Every
    * quantity stays integral, so the trajectory is bit-identical across
    * engines and partitionings where float normalization could not be.
    *
    * Scale shape per round: two (edge-keyed join + map-side-combined agg)
    * passes and two scalar totals; `localCheckpoint` per round keeps the
    * lineage O(1) in iterations. Returns (node, auth_mass, hub_mass).
    * Overflow bound: per-node raw · scale must stay < 2⁶³ (raw ≤ the
    * round total ≤ |edges|·scale) — at web scale drop `scale` to 1e4 or
    * lift the rescale to decimal(38,0), the chi2FeatureSelection move.
    */
  def hitsInteger(nodes: DataFrame, edges: DataFrame, iters: Int,
                  scale: Long = 1000000L): DataFrame = {
    var hub = nodes.select(col("node"), lit(scale).as("hub_mass"))
    var auth = nodes.select(col("node"), lit(scale).as("auth_mass"))
    var i = 0
    while (i < iters) {
      val authRaw = hub.join(edges, hub("node") === edges("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("hub_mass")).as("raw"))
      val aTot = authRaw.agg(coalesce(sum(col("raw")), lit(1L)).as("t"))
      auth = nodes.select(col("node"))
        .join(authRaw, Seq("node"), "left")
        .crossJoin(broadcast(aTot))
        .select(col("node"),
          expr(s"coalesce(raw, 0L) * $scale div t").as("auth_mass"))
        .localCheckpoint(true)
      val hubRaw = auth.join(edges, auth("node") === edges("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("auth_mass")).as("raw"))
      val hTot = hubRaw.agg(coalesce(sum(col("raw")), lit(1L)).as("t"))
      hub = nodes.select(col("node"))
        .join(hubRaw, Seq("node"), "left")
        .crossJoin(broadcast(hTot))
        .select(col("node"),
          expr(s"coalesce(raw, 0L) * $scale div t").as("hub_mass"))
        .localCheckpoint(true)
      i += 1
    }
    auth.join(hub, Seq("node"))
  }

  /** Triangle census by degree-ordered orientation (the Suri–Vassilvitskii
    * MapReduce formulation): each undirected edge is directed from its
    * lower-(degree, id) endpoint to the higher, wedges are enumerated only
    * from each node's oriented out-neighborhood, and a wedge closes iff its
    * far pair is itself an oriented edge. Orientation bounds every node's
    * oriented out-degree by O(√m) — the hub that would fan a naive
    * wedge-join into deg² candidates (a 10⁶-follower account → 10¹²
    * wedges) contributes nothing from its own neighborhood, because almost
    * all of its edges point INTO it. Each triangle is produced exactly
    * once (its rank-minimal vertex is the only wedge center that sees it).
    *
    * Output: one row per node with its triangle-participation count
    * (nodes in no triangle included with 0).
    *
    * @param und canonical undirected edges: columns `a` < `b`, distinct
    */
  /** Bounded-round k-core peeling census: each round recomputes degrees
    * over the surviving undirected edge set, drops nodes with degree < k,
    * and restricts edges to survivors; emitted per round are the alive
    * node and edge counts. Fixed `rounds` keeps the trajectory
    * oracle-checkable (the [[pagerankInteger]] convention — the full
    * fixpoint is this loop run to emptiness of change); each round is one
    * explode-degree aggregation plus two semi-joins, lineage cut per
    * round so planning stays O(1) in rounds. The k-core is the densest
    * robust scaffold of a link graph — the subgraph spam/authority
    * analyses run on after peeling the tendrils.
    *
    * @param und canonical undirected edges: `a` < `b`, distinct
    */
  def kcorePeelCensus(und: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = und.sparkSession
    var edges = und.localCheckpoint(true)
    val out = Seq.newBuilder[(Int, Long, Long)]
    var r = 1
    while (r <= rounds) {
      val deg = edges.select(explode(array(col("a"), col("b"))).as("node"))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      val alive = deg.filter(col("deg") >= k).select(col("node"))
        .localCheckpoint(true)
      edges = edges
        .join(alive.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .join(alive.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
        .select(col("a"), col("b"))
        .localCheckpoint(true)
      out += ((r, alive.count(), edges.count()))
      r += 1
    }
    import spark.implicits._
    out.result().toDF("round", "n_nodes_alive", "n_edges_alive")
  }

  /** The deterministic undirected test graph every graph query walks:
    * chords +1, +2, +3, ×2 over a node-key table (the ×2 chords give
    * log-distance shortcuts and degree variance), endpoints restricted to
    * existing nodes, normalized a<b, deduped — eagerly checkpointed
    * because every consumer references the edge set repeatedly (degrees,
    * wedges, rounds) and an uncut reference replays the 5-scan
    * construction per use (measured 72 base scans in the link-prediction
    * plan before the cut).
    */
  def chordGraph(nodes: DataFrame): DataFrame = {
    val cand = nodes.select(col("node").as("a"), (col("node") + 1).as("b"))
      .unionByName(nodes.select(col("node").as("a"), (col("node") + 2).as("b")))
      .unionByName(nodes.select(col("node").as("a"), (col("node") + 3).as("b")))
      .unionByName(nodes.select(col("node").as("a"), (col("node") * 2).as("b")))
    cand.join(nodes.withColumnRenamed("node", "b"), Seq("b"), "left_semi")
      .filter(col("a") < col("b"))
      .select(col("a"), col("b")).distinct()
      .localCheckpoint(true)
  }

  /** Every triangle of the undirected graph named EXACTLY ONCE via the
    * degree-ordered orientation (the Latapy "forward" enumeration): each
    * edge points from its lower-(deg, id) endpoint to the higher, wedges
    * fan out of a center's oriented OUT-neighborhood — out-degree is
    * O(√m) on any graph, so hubs never fan out (the id-ordered x<y<z
    * 3-join is fine on degree-bounded graphs but hub-quadratic on a
    * power-law graph) — and the closing edge is probed in its one
    * oriented form. Returns one row (u, v, w) per triangle: u the wedge
    * center, v/w its rank-ordered out-neighbors. Shared by
    * [[trianglePerNode]] and the k-truss peel.
    *
    * @param undRaw canonical undirected edges: `a` < `b`, distinct
    */
  def orientedTriangles(undRaw: DataFrame): DataFrame = {
    // DIAMOND-SHAPED reuse (edges feed degrees, orientation, wedges AND
    // the closing probe): without a lineage cut each reference re-plans
    // and re-executes the caller's whole edge-derivation subtree — the
    // uncut plan here measured ~1800 physical nodes. The two interior
    // cuts (edge set, oriented edges) are the [[pagerankInteger]]
    // convention; everything downstream references each exactly once via
    // explode(array(...)) instead of self-unions.
    val und = undRaw.localCheckpoint(true)
    // total degree per node over the undirected edge set — ONE pass
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // total order for orientation: (deg, id) packed into one comparable
    // long (ids are table keys << 10^12, degrees bounded by n)
    val rk = (d: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =>
      d * lit(1000000000000L) + n
    val withRanks = und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), Seq("b"))
      .select(col("a"), col("b"),
        rk(col("deg_a"), col("a")).as("rank_a"),
        rk(col("deg_b"), col("b")).as("rank_b"))
    val oriented = withRanks.select(
      when(col("rank_a") < col("rank_b"), col("a")).otherwise(col("b")).as("src"),
      when(col("rank_a") < col("rank_b"), col("b")).otherwise(col("a")).as("dst"),
      greatest(col("rank_a"), col("rank_b")).as("rank_dst"))
      .localCheckpoint(true)  // referenced by BOTH wedge sides + the probe
    // wedges from each center's oriented out-neighborhood; (v, w) ordered
    // by rank so the closing edge (v -> w) can exist in exactly one form
    val l = oriented.select(col("src").as("u"), col("dst").as("n1"), col("rank_dst").as("r1"))
    val r = oriented.select(col("src").as("u"), col("dst").as("n2"), col("rank_dst").as("r2"))
    val wedges = l.join(r, Seq("u")).filter(col("r1") < col("r2"))
      .select(col("u"), col("n1").as("v"), col("n2").as("w"))
    val closing = oriented.select(col("src").as("v"), col("dst").as("w"))
    wedges.join(closing, Seq("v", "w"), "left_semi")
  }

  def trianglePerNode(nodes: DataFrame, undRaw: DataFrame): DataFrame = {
    val triangles = orientedTriangles(undRaw)
    val perCorner = triangles
      .select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("tri_count"))
    nodes.select(col("node"))
      .join(perCorner, Seq("node"), "left")
      .select(col("node"), coalesce(col("tri_count"), lit(0L)).as("tri_count"))
  }

  /** Bounded-round BFS hop distances from a seed set over an undirected
    * edge list — monotone frontier relaxation: after round k every node
    * within k hops of a seed holds its EXACT hop distance (induction: a
    * shortest path of length d relaxes one edge per round), so a fixed
    * round count is both the scalability bound and the oracle-checkable
    * trajectory (the [[pagerankInteger]] convention — full BFS is this
    * loop run to no-change). Nodes beyond `rounds` hops are absent.
    *
    * Scale shape: per round ONE node-keyed join of the distance table
    * against the symmetrized adjacency plus one map-side-combined min-agg
    * — the Pregel BFS step; lineage cut per round (`localCheckpoint`) so
    * plan depth stays O(1) in rounds. Distances only shrink, so the
    * min-agg is idempotent under re-delivery of any frontier row.
    *
    * @param seeds one `node` column (distance 0)
    * @param und   canonical undirected edges: columns `a` < `b`, distinct
    */
  def bfsHops(seeds: DataFrame, und: DataFrame, rounds: Int): DataFrame = {
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
    var dist = seeds.select(col("node"), lit(0).as("dist")).localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      dist = dist
        .unionByName(adj.join(dist, adj("u") === dist("node"))
          .select(col("v").as("node"), (col("dist") + 1).as("dist")))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      r += 1
    }
    dist
  }

  /** Single-source STRESS centrality within a bounded radius — Brandes'
    * two-phase accumulation in the INTEGER semiring: forward, σ(v) = the
    * number of shortest s→v paths (level-synchronous sum over the
    * shortest-path DAG's in-edges); backward, f(v) = 1 + Σ f(w) over DAG
    * out-edges (the number of shortest-path suffixes from v, targets
    * within the radius, v itself included); through(v) = σ(v)·f(v)
    * counts every shortest s→t path containing v. This is the
    * betweenness-family member that stays EXACT cross-engine (Shimbel's
    * stress; Brandes 2008, "On Variants of Shortest-Path Betweenness"):
    * true betweenness accumulates fractional δ ratios whose float SUMS
    * are accumulation-order-dependent and would break the oracle hash —
    * stress multiplies integer counts instead, same two-phase shape.
    * Bounded rounds are the [[bfsHops]] contract: within radius R every
    * dist, σ and f is exact, and the oracle unrolls identical levels.
    *
    * Scale shape: 2R level-synchronous node-keyed joins against the
    * symmetrized adjacency (each level one join + one map-side-combined
    * sum, lineage cut per level) — the Pregel betweenness pass; no
    * all-pairs anything, node tables only.
    */
  def stressCentrality(seed: DataFrame, und: DataFrame, rounds: Int): DataFrame = {
    val adj = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(true)
    val dist = bfsHops(seed, und, rounds).localCheckpoint(true)
    // forward: σ per level over the shortest-path DAG (dist(w) = dist(v)+1)
    var sigma = dist.filter(col("dist") === 0)
      .select(col("node"), lit(1L).as("sigma")).localCheckpoint(true)
    var sigmaAll = sigma
    for (k <- 1 to rounds) {
      sigma = adj.join(sigma.withColumnRenamed("node", "u"), Seq("u"))
        .select(col("v").as("node"), col("sigma"))
        .join(dist.filter(col("dist") === k).select(col("node")),
          Seq("node"), "left_semi")
        .groupBy(col("node")).agg(sum(col("sigma")).as("sigma"))
        .localCheckpoint(true)
      sigmaAll = sigmaAll.unionByName(sigma)
    }
    // backward: f from the deepest level down (truncation = the radius
    // contract: suffixes beyond R hops are out of scope by definition)
    var f = dist.filter(col("dist") === rounds)
      .select(col("node"), lit(1L).as("f")).localCheckpoint(true)
    var fAll = f
    for (k <- (rounds - 1) to 0 by -1) {
      val lvl = dist.filter(col("dist") === k).select(col("node"))
      val contrib = adj
        .join(f.select(col("node").as("v"), col("f").as("fw")), Seq("v"))
        .select(col("u").as("node"), col("fw"))
        .join(lvl, Seq("node"), "left_semi")
        .groupBy(col("node")).agg(sum(col("fw")).as("fsum"))
      f = lvl.join(contrib, Seq("node"), "left")
        .select(col("node"), (coalesce(col("fsum"), lit(0L)) + 1L).as("f"))
        .localCheckpoint(true)
      fAll = fAll.unionByName(f)
    }
    sigmaAll.join(fAll, Seq("node")).join(dist, Seq("node"))
      .select(col("node"), col("dist"), col("sigma"), col("f"),
        (col("sigma") * col("f")).as("through"))
  }

  /** Bounded-round Bellman-Ford over WEIGHTED undirected edges — the
    * weighted sibling of [[bfsHops]] (same per-round shape: one node-keyed
    * join + one min-agg with map-side combine, `localCheckpoint` lineage
    * cut per round; distances are exact integers on both engines). After
    * `rounds` relaxations every node holds the exact shortest distance
    * among paths of ≤ `rounds` edges — the oracle unrolls the identical
    * monotone recurrence, so truncation is part of the contract, not an
    * approximation gap. Negative weights are fine for the relaxation but
    * the fixtures use positive ones.
    *
    * @param und (a, b, w) undirected weighted edges
    */
  def ssspWeighted(seeds: DataFrame, und: DataFrame, rounds: Int): DataFrame = {
    val adj = und.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v"), col("w")))
    var dist = seeds.select(col("node"), lit(0L).as("dist")).localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      dist = dist
        .unionByName(adj.join(dist, adj("u") === dist("node"))
          .select(col("v").as("node"), (col("dist") + col("w")).as("dist")))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
      r += 1
    }
    dist
  }

  /** Synchronous label propagation (Raghavan et al. 2007) community
    * detection, made deterministic and oracle-checkable: every node starts
    * labeled with its own id; each round every node with ≥1 neighbor
    * adopts the most frequent label among its neighbors, ties broken by
    * SMALLEST label (the lexicographic struct-argmax, exact on both
    * engines); isolated nodes keep their label. Fixed `rounds` pins the
    * trajectory — synchronous LPA can oscillate on bipartite structure, so
    * the bounded-round prefix IS the contract (the [[ssspWeighted]] /
    * [[pagerankInteger]] convention).
    *
    * Scale shape: per round ONE nbr-keyed join of the label table against
    * the doubled edge list, one (node,label) count, one per-node
    * struct-max — all map-side-combinable aggregations keyed by node;
    * lineage cut per round.
    *
    * @param nodes one `node` column, distinct
    * @param und canonical undirected edges: `a` < `b`, distinct
    */
  def labelPropagation(nodes: DataFrame, und: DataFrame, rounds: Int): DataFrame = {
    val nbrs = und.select(col("a").as("node"), col("b").as("nbr"))
      .unionByName(und.select(col("b").as("node"), col("a").as("nbr")))
      .localCheckpoint(true)
    var labels = nodes.select(col("node"), col("node").as("label"))
    var r = 0
    while (r < rounds) {
      val votes = nbrs
        .join(labels.select(col("node").as("nbr"), col("label").as("nbr_label")),
          Seq("nbr"))
        .groupBy(col("node"), col("nbr_label")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("node"))
        .agg(max(struct(col("cnt"), (-col("nbr_label")).as("neg"))).as("best"))
        .select(col("node"), (-col("best.neg")).as("new_label"))
      labels = labels.join(votes, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).cast("long").as("label"))
        .localCheckpoint(true)
      r += 1
    }
    labels
  }

  /** Modularity census of a community assignment (Newman's Q, the
    * partition-quality number the LP/community family is tuned by):
    * per community c, Q_c = L_c/m − (d_c/2m)² where m = undirected edge
    * count, L_c = intra-community edges, d_c = degree sum — emitted as
    * the EXACT integer contrib_e6 = ⌊10⁶·(4m·L_c − d_c²) / 4m²⌋
    * (sign-split floor division, cross-engine exact; Σ contrib_e6 ≈
    * 10⁶·Q). One degree aggregate + one label-joined edge count — both
    * shuffle on community/node keys, nothing quadratic; the census costs
    * two passes over the edge list at any scale.
    */
  def modularityCensus(und: DataFrame, labels: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val byC = deg.join(labels, Seq("node"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("degree_sum"))
    val intra = und
      .join(labels.select(col("node").as("a"), col("label").as("la")), Seq("a"))
      .join(labels.select(col("node").as("b"), col("label").as("lb")), Seq("b"))
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("intra_edges"))
    val mRow = und.agg(count(lit(1)).as("m_edges"))
    byC.join(intra, Seq("label"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .crossJoin(broadcast(mRow))
      // numerator through DECIMAL(38,0): degree_sum reaches 2m, so the
      // BIGINT product 10⁶·d² would overflow Long near m ≈ 1.5M edges —
      // the same cast ladder ts_stl_anomaly rides (HUGEINT in the DuckDB
      // mirror); `div` on decimals returns BIGINT and |contrib_e6| ≤ 10⁶
      .withColumn("_num", expr(
        """CAST(1000000 AS DECIMAL(38,0)) *
           (4 * CAST(m_edges AS DECIMAL(38,0)) * intra_edges
            - CAST(degree_sum AS DECIMAL(38,0)) * degree_sum)"""))
      .withColumn("_den", expr("4 * CAST(m_edges AS DECIMAL(38,0)) * m_edges"))
      .withColumn("contrib_e6", expr(
        "CAST(CASE WHEN _num < 0 THEN -((-_num) div _den) ELSE _num div _den END AS BIGINT)"))
      .select(col("label"), col("n_nodes"), col("degree_sum"),
        col("intra_edges"), col("m_edges"), col("contrib_e6"))
  }

  /** Conductance census — [[modularityCensus]]'s dual: per community,
    * φ(c) = cut(c) / min(vol(c), 2m − vol(c)) as the exact integer
    * ⌊10⁶·cut/denom⌋ (all terms non-negative, truncating division equal
    * in both engines; a community holding the whole graph has denom 0
    * and reads 0 by convention). Low conductance = a well-separated
    * community; the census is the cut-quality view next to modularity's
    * density view. Cut edges count toward BOTH endpoint communities.
    * Same two edge-list passes as the modularity census.
    */
  def conductanceCensus(und: DataFrame, labels: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("node"))
      .unionByName(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val byC = deg.join(labels, Seq("node"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("vol"))
    val sided = und
      .join(labels.select(col("node").as("a"), col("label").as("la")), Seq("a"))
      .join(labels.select(col("node").as("b"), col("label").as("lb")), Seq("b"))
      .filter(col("la") =!= col("lb"))
    val cut = sided.select(col("la").as("label"))
      .unionByName(sided.select(col("lb").as("label")))
      .groupBy(col("label")).agg(count(lit(1)).as("cut_edges"))
    val mRow = und.agg(count(lit(1)).as("m_edges"))
    byC.join(cut, Seq("label"), "left")
      .na.fill(0L, Seq("cut_edges"))
      .crossJoin(broadcast(mRow))
      .withColumn("_den", expr("least(vol, 2 * m_edges - vol)"))
      .withColumn("conductance_e6", expr(
        "CAST(CASE WHEN _den = 0 THEN 0 ELSE (1000000 * cut_edges) div _den END AS BIGINT)"))
      .select(col("label"), col("n_nodes"), col("vol"), col("cut_edges"),
        col("m_edges"), col("conductance_e6"))
  }
}
