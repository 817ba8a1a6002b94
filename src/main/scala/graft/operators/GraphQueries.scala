package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Iterative graph analytics beyond connected components
  * (DedupCluster): PageRank over the bipartite part↔supplier graph
  * implied by lineitem, with every arithmetic step INTEGER-QUANTIZED
  * so a fixed iteration count is bit-reproducible under any
  * partitioning AND replicable in the DuckDB oracle — float PageRank
  * sums in accumulation order, which no distributed engine can pin.
  *
  * Quantization: ranks are integers scaled by [[PrScale]]; each
  * iteration sends `pr div outdeg` along every edge (integer floor —
  * deterministic mass loss, same floor in both engines) and applies
  * damping as `0.15·scale + (sum·85) div 100` — all closed under
  * 64-bit integers.
  *
  * 100 TB shape: each iteration is one equi-join (edges ⋈ ranks, both
  * keyed by src) plus one map-side-combined aggregate keyed by dst —
  * the standard distributed PageRank step; edges are localCheckpointed
  * once and reused by all [[PrIters]] iterations. Nodes are encoded
  * part→2k, supplier→2k+1 so the two id spaces never collide; edges
  * carry both directions, so every node has outdeg ≥ 1 (no dangling
  * mass) and survives every iteration.
  */
object GraphQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Fixed iteration count — the oracle unrolls the same number. */
  val PrIters = 3

  /** Integer rank scale (1.0 ≙ 1,000,000). */
  val PrScale = 1000000L

  /** One edge-table build (distinct + checkpoint) per (context,
    * input): the graph is a pure function of the data and is read by
    * outdeg + every iteration of every invocation — same memoization
    * contract as the shingle/KMeans/winnow caches. */
  private val edgeCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def g5Pagerank(s: SparkSession, dir: String): DataFrame = {
    val edges = edgesFor(s, dir)
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
    var pr = outdeg.select(col("src").as("node"), lit(PrScale).as("pr"))
    for (_ <- 1 to PrIters) {
      val rate = pr
        .join(outdeg.withColumnRenamed("src", "node"), "node")
        .select(col("node").as("src"), expr("pr div outdeg").as("rate"))
      pr = edges.join(rate, "src")
        .groupBy(col("dst").as("node"))
        .agg((lit(PrScale * 15 / 100) +
          expr("(sum(rate) * 85) div 100")).as("pr"))
    }
    pr.select(col("node"), col("pr"))
  }

  /** Convergence-loop variant (VERDICT r12 task #6): g5's fixed 3
    * iterations demonstrate the step; real usage iterates to a
    * tolerance. 20 because the bipartite graph's rank mass
    * OSCILLATES between the two sides (period-2), so the L1 delta
    * decays only as the damping power 0.85^k — the 5% per-node bar
    * lands around k ≈ 18; a 15 cap was measured to bind before
    * convergence at sf0.01. */
  val PrbMaxIters = 20

  /** Per-node L1 tolerance: stop when the summed |Δpr| over all
    * nodes falls to 5% of [[PrScale]] per node. Integer, so the
    * convergence DECISION is bit-reproducible and the oracle can
    * replay it. */
  val PrbTolPerNode = PrScale / 20

  /** PageRank iterated to convergence: same integer-quantized step
    * as [[g5Pagerank]], with an L1-delta stop — after each step the
    * engine sums |pr_i − pr_{i−1}| (exact longs, any partitioning)
    * and stops at the FIRST iteration where the total falls under
    * `n_nodes · PrbTolPerNode`, or at [[PrbMaxIters]]. The chosen
    * iteration is emitted as `n_iters`, so the stopping decision
    * itself is part of the hash-compared result. Each iterate is
    * localCheckpointed: iteration i+1 and the delta both read a
    * materialized i-th iterate instead of re-executing an
    * i-join-deep lineage (the classic iterative-Spark trap).
    *
    * The oracle unrolls all [[PrbMaxIters]] stages, computes every
    * stage's delta, and selects rows from stage
    * `min{i : Δi ≤ tol} ∪ {max}` — a data-independent REPLAY of the
    * engine's data-dependent loop, so both engines agree on ranks
    * AND iteration count bit-for-bit.
    *
    * Iteration hygiene (VERDICT r13 task #5): the delta is FOLDED
    * into the iteration's materialization — each checkpointed iterate
    * carries `pr_prev` alongside `pr` (the join with the previous
    * iterate rides the same groupBy exchange), so the per-iteration
    * jobs are one heavy pass (join+agg+checkpoint) plus a cheap scan
    * of the just-materialized blocks, instead of the former second
    * join job. Likewise `outdeg` (VERDICT r15 task #2) rides INSIDE
    * the checkpointed iterate: it is constant across iterations, and
    * the pr_prev join already meets the previous iterate row-for-row,
    * so carrying it as a column deletes the per-iteration pr⋈outdeg
    * join + exchange entirely — the rate projection becomes a narrow
    * map over the just-checkpointed blocks. And each superseded
    * iterate's checkpoint blocks are
    * freed EAGERLY ([[org.apache.spark.sql.GraftSqlShims
    * .unpersistLocalCheckpoint]]) once its successor is materialized —
    * without this, up to [[PrbMaxIters]] rank tables sit in executor
    * storage memory until driver GC notices (the r13 storage-pressure
    * flag). */
  def g5bPagerankConverged(s: SparkSession, dir: String): DataFrame = {
    val edges = edgesFor(s, dir)
    val outdeg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("outdeg"))
      .localCheckpoint() // read by every iteration + the node count
    val nNodes = outdeg.count()
    val tol = nNodes * PrbTolPerNode
    // the iterate carries (node, pr, outdeg): outdeg is constant, so
    // folding it into the checkpoint makes the rate a pure projection
    var ckpt = outdeg
      .select(col("src").as("node"), lit(PrScale).as("pr"),
        col("outdeg"))
      .localCheckpoint() // the iterate whose blocks we own + may free
    var it = 0
    var converged = false
    while (it < PrbMaxIters && !converged) {
      val rate = ckpt
        .select(col("node").as("src"), expr("pr div outdeg").as("rate"))
      // one materialization serves both consumers: the new ranks AND
      // the delta operands (pr_prev + outdeg joined in before the
      // checkpoint, so the delta job below is a scan of these blocks,
      // not a join, and the next rate needs no join either)
      val next = edges.join(rate, "src")
        .groupBy(col("dst").as("node"))
        .agg((lit(PrScale * 15 / 100) +
          expr("(sum(rate) * 85) div 100")).as("pr"))
        .join(ckpt.select(col("node"), col("pr").as("pr_prev"),
          col("outdeg")), "node")
        .localCheckpoint()
      val delta = next
        .agg(sum(abs(col("pr") - col("pr_prev"))).cast("long"))
        .head().getLong(0)
      // the old iterate is fully superseded: next is materialized and
      // carries pr_prev, so nothing will read the old blocks again
      org.apache.spark.sql.GraftSqlShims.unpersistLocalCheckpoint(ckpt)
      ckpt = next
      it += 1
      converged = delta <= tol
    }
    ckpt.select(col("node"), col("pr"),
      lit(it).cast("int").as("n_iters"))
  }

  private def edgesFor(s: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElseUpdate(
      s.sparkContext.applicationId + ":" + dir, {
        val pairs = Tables.lineitem(s, dir)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val fwd = pairs.select(
          (col("l_partkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
        fwd.unionByName(
          fwd.select(col("dst").as("src"), col("src").as("dst")))
          // hash-partition on src ONCE at build (union destroys the
          // upstream partitioning): every PageRank iteration joins
          // edges⋈rate on src, and the checkpoint preserves this
          // partitioning, so the BIG side never re-exchanges — only
          // the node-sized rate table shuffles per iteration
          .repartition(col("src"))
          .localCheckpoint() // consumed by outdeg + every iteration
      })

  /** Distributed triangle counting on the co-purchase graph (parts
    * joined by a shared order) — the MapReduce classic (Suri &
    * Vassilvitskii, WWW'11): orient every undirected edge from its
    * lower-(degree, id) endpoint, enumerate wedges only at each
    * node's out-neighborhood, and close them against the oriented
    * edge list. Orientation bounds per-node wedge fanout by
    * O(sqrt(|E|)) on skewed graphs — the hub that breaks the naive
    * u<v<w triple join is exactly the node the orientation silences.
    *
    * Graph choice (r12): parts-per-ORDER, not suppliers-per-part —
    * the supplier universe is so small that by sf0.1 its co-supply
    * graph saturated to the COMPLETE K₁₀₀₀ (499,500 = C(1000,2)
    * edges, 1.66e8 triangles, 26 s of pure output enumeration);
    * the part graph stays sparse at every SF (sf0.1: 20k nodes,
    * 1.2M edges, 1.9M triangles) and is the market-basket graph
    * x27 mines pairwise.
    *
    * 100 TB shape: equi-joins only, no inequality-only join
    * anywhere: edge build groups on orderkey (parts-per-order is
    * basket-bounded), and the closure is the EDGE-ITERATOR — each
    * oriented edge meets the two endpoints' sorted out-neighbor
    * arrays (size ≤ O(√E) by the orientation) and counts their
    * intersection in a codegen'd expression, so the exchange
    * carries |E| adjacency-decorated edges, never the wedge fanout.
    * The triangle COUNT is orientation-invariant, so the oracle can
    * use the simple id-ordered triple join — same number, different
    * (quadratic-in-hub) plan that is fine at oracle scale. */
  def g6Triangles(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    // the basket self-join + distinct is the expensive subtree and
    // feeds THREE consumers (degree census, orientation, edge
    // count) — materialize once, the g5 edge-cache discipline
    val edges = pairs.as("x").join(pairs.as("y"), Seq("o"))
      .filter(col("x.p") < col("y.p"))
      .select(col("x.p").as("u"), col("y.p").as("v"))
      .distinct()
      .localCheckpoint()
    triangleClosure(s, edges)
  }

  /** g6's serve twin off the persisted co-purchase graph index
    * (VERDICT r15 task #1): the expensive subtree — the basket
    * self-join over lineitem — is replaced by a scan of the
    * edge-sized `graph_pairs` table; the distinct collapses the
    * base/delta partial-count rows to the edge SET, and the closure
    * is byte-identical to the scan twin's (same [[triangleClosure]]),
    * so the shared oracle hash certifies the persisted index content
    * end-to-end. lineitem is absent from the serve plan
    * (GraphIndexSpec asserts this). */
  def g6TrianglesIndexed(s: SparkSession, dir: String): DataFrame =
    triangleClosure(s, indexedEdgeSource(s, dir).localCheckpoint())

  /** The indexed serve's only file-reading subtree (the checkpoint in
    * [[g6TrianglesIndexed]] truncates lineage, so GraphIndexSpec
    * asserts the lineitem-absent file discipline on THIS plan). */
  private[graft] def indexedEdgeSource(s: SparkSession,
      dir: String): DataFrame = {
    val gp = graft.sources.IndexStore.ensureGraphEdges(s, dir)
    s.read.parquet(gp.pairs)
      // a pair co-occurring in both base and delta orders carries one
      // partial-count row per split — the edge set is their distinct
      .select(col("u"), col("v")).distinct()
  }

  /** Degree-ordered orientation + sorted-adjacency edge-iterator
    * closure over a materialized undirected edge set (u < v) — the
    * part of [[g6Triangles]] both twins share. */
  private def triangleClosure(s: SparkSession,
      edges: DataFrame): DataFrame = {
    val deg = edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    // orient: src = endpoint with smaller (degree, id); carry the
    // dst's (degree, id) so wedge pairs can be ordered without a
    // further degree join
    val dedges = edges
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(when(
          struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("s"), col("v").as("t")))
        .otherwise(struct(col("v").as("s"), col("u").as("t")))
        .as("e"))
      .select(col("e.s").as("src"), col("e.t").as("dst"))
      .localCheckpoint() // consumed by the adjacency build AND the
                         // per-edge closure join
    // edge-iterator closure: a triangle with oriented edges a→b,
    // a→c, b→c is counted exactly once, at edge (a,b), as a common
    // out-neighbor c ∈ N⁺(a) ∩ N⁺(b). Carrying SORTED adjacency
    // arrays (out-degree ≤ O(√E) by the orientation) to each edge
    // replaces the wedge fanout — the wedge-join formulation
    // shuffled ~70M wedge rows at sf0.1 (11.5 s); the per-edge
    // codegen'd array_intersect does the same closure in-place.
    graft.functions.IntersectCount.ensureRegistered(s)
    val adj = dedges.groupBy(col("src"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val tri = dedges
      .join(adj, "src")
      .join(adj.select(col("src").as("dst"),
        col("nbrs").as("nbrs_dst")), Seq("dst"))
      // native sorted-merge count: no per-pair hash table, no
      // materialized intersection array (adjacency is sort_array'd)
      // coalesce restores 0-on-empty: on a graph where both
      // adjacency joins drop every row (e.g. a single-edge corpus)
      // sum() yields NULL while the oracle's count(*) yields 0
      .agg(coalesce(sum(call_function("intersect_count", col("nbrs"),
        col("nbrs_dst"))), lit(0L)).cast("long").as("n_triangles"))
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    val ne = edges.agg(count(lit(1)).as("n_edges"))
    nn.crossJoin(ne).crossJoin(tri)
  }

  val queries: Map[String, Q] = Map(
    "g5_pagerank" -> (g5Pagerank _),
    "g5b_pagerank_converged" -> (g5bPagerankConverged _),
    "g6_triangles" -> (g6Triangles _),
    "g6_triangles_indexed" -> (g6TrianglesIndexed _)
  )

  /** The oracle unrolls the [[PrIters]] iterations as CTE stages —
    * all-integer arithmetic, so every rank hash-compares. */
  val oracle: Map[String, String] = {
    // PrScale interpolated, never re-hard-coded (ADVICE r11): the
    // engine derives 150000 as PrScale*15/100, so the oracle must too
    val base =
      s"""WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        |edges AS (SELECT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |          FROM pairs
        |          UNION ALL
        |          SELECT l_suppkey * 2 + 1, l_partkey * 2 FROM pairs),
        |outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
        |pr0 AS (SELECT src AS node, $PrScale::BIGINT AS pr FROM outdeg)""".stripMargin
    def iterCtes(n: Int): String = (1 to n).map { i =>
      s"""it$i AS (SELECT e.dst AS node,
         |  CAST(${PrScale * 15 / 100} + (sum(p.pr // o.outdeg) * 85) // 100 AS BIGINT) AS pr
         |FROM edges e
         |JOIN ${if (i == 1) "pr0" else s"it${i - 1}"} p ON e.src = p.node
         |JOIN outdeg o ON o.src = e.src
         |GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    val iters = iterCtes(PrIters)
    // convergence replay (g5b): unroll ALL PrbMaxIters stages, take
    // each stage's L1 delta vs its predecessor, and select rows from
    // stage min{i : Δi ≤ n_nodes·tol} (else the cap) — the
    // data-independent SQL image of the engine's stop-at-first loop
    val deltas = (1 to PrbMaxIters).map { i =>
      val prev = if (i == 1) "pr0" else s"it${i - 1}"
      s"""d$i AS (SELECT $i AS it, CAST(sum(abs(a.pr - b.pr)) AS BIGINT) AS d
         |FROM it$i a JOIN $prev b ON a.node = b.node)""".stripMargin
    }.mkString(",\n")
    val allDeltas = (1 to PrbMaxIters)
      .map(i => s"SELECT it, d FROM d$i").mkString("\nUNION ALL ")
    val allStages = (1 to PrbMaxIters)
      .map(i => s"SELECT $i AS it, node, pr FROM it$i")
      .mkString("\nUNION ALL ")
    val convergedSql =
      base + ",\n" + iterCtes(PrbMaxIters) + ",\n" + deltas + s""",
        |dd AS ($allDeltas),
        |chosen AS (SELECT coalesce(min(it), $PrbMaxIters) AS it
        |           FROM dd
        |           WHERE d <= (SELECT count(*) FROM pr0) * $PrbTolPerNode),
        |stages AS ($allStages)
        |SELECT s.node, s.pr, CAST(c.it AS INTEGER) AS n_iters
        |FROM stages s, chosen c WHERE s.it = c.it""".stripMargin
    Map("g5_pagerank" ->
      (base + ",\n" + iters + s"\nSELECT node, pr FROM it$PrIters"),
      "g5b_pagerank_converged" -> convergedSql,
      // the count is orientation-invariant: the oracle's id-ordered
      // triple join and the engine's degree-ordered wedge closure
      // agree on the number while having very different hub behavior.
      // The indexed twin shares this scan-semantics oracle verbatim:
      // a hash match certifies the persisted graph_pairs content
      // (build + delta append + serve) against the from-scratch
      // derivation, the dd_minhash_indexed discipline.
      "g6_triangles" -> g6OracleSql,
      "g6_triangles_indexed" -> g6OracleSql)
  }

  // lazy: referenced from the `oracle` val's initializer above —
  // a plain val here would still be null at that point (object
  // fields initialize in declaration order)
  private lazy val g6OracleSql =
    """WITH pairs AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
      |              FROM lineitem),
      |edges AS (SELECT DISTINCT x.p AS u, y.p AS v
      |          FROM pairs x JOIN pairs y
      |            ON x.o = y.o AND x.p < y.p),
      |nodes AS (SELECT u AS n FROM edges
      |          UNION SELECT v FROM edges),
      |tri AS (SELECT count(*) AS c
      |        FROM edges e1
      |        JOIN edges e2 ON e2.u = e1.v
      |        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
      |SELECT (SELECT count(*) FROM nodes) AS n_nodes,
      |  (SELECT count(*) FROM edges) AS n_edges,
      |  (SELECT c FROM tri) AS n_triangles""".stripMargin
}
