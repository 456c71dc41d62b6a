package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge frames — the reference graph a STIX corpus
  * carries (`__reflist` rows + scalar `*_ref` columns) is a directed graph
  * over SCO ids, and ranking its nodes is the classic "which
  * address/process is structurally central in this hunt" signal.
  */
object Graph {

  /** Weakly-connected components of a directed edge list: every node
    * labeled with the smallest node id reachable through edges in EITHER
    * direction, plus its component's size — the hunt question "which
    * entities form one connected cluster of activity" (and the prelude to
    * per-component rollups). Thin wrapper over the dup-group engine
    * ([[Dedup.dupGroups]]): the near-dup pair graph there IS a component
    * problem, so this inherits its two-mode scale shape — driver
    * union-find below the edge bound, distributed min-label propagation
    * (per-iteration equi-join + min aggregate, no windows) above it. For
    * string ids the label is the lexicographic minimum, matching SQL
    * `min` — engine-reproducible. */
  def connectedComponents(
      edges: DataFrame,
      maxIters: Int = 20,
      driverMaxEdges: Long = 5000000L): DataFrame = {
    // pin the deduped edge frame: it is read again for the node set and
    // then per label-propagation iteration inside dupGroups — without the
    // pin the whole upstream scan/union subtree re-executes per reader
    // (measured: the q_stix edge build is a >100-task scan re-run 3-5x)
    val e = edges
      .where(col("src").isNotNull && col("dst").isNotNull)
      .select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    val labeled = Dedup
      .dupGroups(nodes, e.select(col("src").as("a_id"), col("dst").as("b_id")),
        idCol = "id", maxIters = maxIters, driverMaxEdges = driverMaxEdges)
      .withColumnRenamed("group_id", "component_id")
    val sizes = labeled.groupBy("component_id").agg(count(lit(1)).as("component_size"))
    // usually components ≪ nodes, but an edge-sparse graph degenerates to
    // ~one component per node — a plain join lets Catalyst broadcast only
    // when the size table actually fits (AQE decides from runtime stats)
    labeled.join(sizes, Seq("component_id"))
      .select(col("id"), col("component_id"), col("component_size"))
  }

  /** Damped PageRank, fixed iteration count. Simplified standard form: no
    * dangling-mass redistribution (sink-leaked mass just contracts the
    * total — ranking order is unaffected for the hub-detection use), and
    * ranks round to 9dp per iteration so the iterate is cross-engine
    * reproducible (the kmeansCentroids rationale: unrounded partial-sum
    * noise would compound across iterations).
    *
    * Scale shape per iteration: one (edge ⋈ outdeg ⋈ rank) join keyed on
    * src, one contribution sum keyed on dst — both hash-partitioned on node
    * ids, rank state is nodes-sized (≪ edges). The loop builds a linear
    * lazy DAG, so `checkpointEvery` > 0 truncates the lineage every that
    * many iterations (eager localCheckpoint — the rank state is nodes-sized
    * and already materialized by the iteration's shuffle): without it,
    * analysis/optimization cost grows linearly with iters and a lost
    * executor replays the entire chain. Ranks round per iteration, so the
    * checkpointed and uncheckpointed iterates are bit-identical. */
  def pageRank(
      edges: DataFrame,
      iters: Int = 3,
      damping: Double = 0.85,
      srcCol: String = "src",
      dstCol: String = "dst",
      checkpointEvery: Int = 0): DataFrame = {
    // pin the deduped edge frame ONCE: every iteration joins it (plus the
    // outdeg build and the node set) — unpinned, the upstream scan subtree
    // re-executes 2x per iteration. The pin is the standard iterative-graph
    // edge materialization (same discipline as the rank-state checkpoints).
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .where(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .localCheckpoint(true)
    // nodes and outdeg are node-sized and read per iteration — pin both
    val nodes = e.select(col("src").as("id")).union(e.select(col("dst").as("id"))).distinct()
      .localCheckpoint(true)
    val nn = broadcast(nodes.agg(count(lit(1)).as("n")))
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).localCheckpoint(true)
    var ranks = nodes.crossJoin(nn).select(col("id"), round(lit(1.0) / col("n"), 9).as("rank"))
    (1 to iters).foreach { i =>
      val contribs = e
        .join(outdeg, "src")
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .select(col("dst").as("id"), (col("rank") / col("outdeg")).as("c"))
        .groupBy("id")
        .agg(sum(col("c")).as("s"))
      ranks = nodes
        .crossJoin(nn)
        .join(contribs, Seq("id"), "left_outer")
        .select(
          col("id"),
          round(
            lit(1.0 - damping) / col("n") + lit(damping) * coalesce(col("s"), lit(0.0)),
            9).as("rank"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(true)
    }
    ranks.select(col("id"), round(col("rank"), 6).as("rank"))
  }

  /** k-core of the undirected view of an edge frame: the maximal subgraph
    * in which every node keeps degree ≥ k, computed by the standard peel
    * loop (drop nodes under degree k, re-count, repeat) — the
    * "dense backbone" complement to [[connectedComponents]] (which keeps
    * every pendant) and [[triangleCounts]] (which only sees 3-cliques).
    * In a hunt graph the 2-core strips leaf observations and keeps the
    * mutually-linked infrastructure; in a crawl/link graph the k-core is
    * the classic spam-farm / hub-cluster signal.
    *
    * Runs a FIXED `rounds` peel passes and reports convergence instead of
    * looping to an unbounded fixpoint (the [[pageRank]] /
    * connectedComponents maxIters discipline — a diameter-shaped graph
    * must fail loud, not hang): `converged` is true iff the last pass
    * removed nothing, in which case the result IS the exact k-core
    * (peeling is monotone — each pass's edge set is a subset of the
    * previous, so an unchanged pass is the fixpoint). Extra passes after
    * convergence are no-ops, so `rounds` trades driver round-trips for
    * certainty, never correctness. Callers seeing `converged=false`
    * re-run with higher `rounds` — or resume INCREMENTALLY from the
    * surviving edge set via [[kCoreEdges]] (peeling is monotone, so
    * continuing from the survivors equals one longer run; law-tested)
    * instead of recomputing every peel from scratch.
    *
    * Scale shape per pass: one degree aggregate (node-keyed, map-side
    * combinable) + two semi-join-shaped equi-joins restricting the edge
    * list — all hash-partitioned on node ids, state is the shrinking edge
    * list itself. The convergence flag is a crossJoin of two 1-row
    * aggregates, not a driver count.
    *
    * Unlike [[pageRank]]'s LINEAR iterate chain, each peel pass references
    * the previous edge set ~5× (degree union twice, join base once, and
    * twice more through the two survivor joins), so an unchecked lazy plan
    * grows ~5^rounds relation nodes and Catalyst ANALYSIS becomes the
    * bottleneck long before execution (8 unchecked rounds ≈ 390k nodes).
    * `checkpointEvery` therefore defaults to 1: every pass eagerly pins its
    * (edge-sized, already-shuffled) output — the standard iterative-graph
    * materialization — keeping the plan constant-size per round. 0 keeps
    * the fully lazy chain and is safe only for tiny round counts.
    *
    * Output: one row per surviving node — (id, core_deg, converged),
    * core_deg the node's degree within the surviving subgraph (≥ k when
    * converged; a survivor isolated by the final pass reports 0). */
  def kCore(
      edges: DataFrame,
      k: Int,
      rounds: Int = 4,
      srcCol: String = "src",
      dstCol: String = "dst",
      checkpointEvery: Int = 1): DataFrame = {
    // pin the normalized entry frame under the same policy as the per-round
    // checkpoints: peel round 1 references it ~5x (degree union twice, join
    // base, two survivor joins) and with an unpinned scan-shaped input the
    // whole upstream subtree re-executes per reference
    val und0 = normalizeUndirected(edges, srcCol, dstCol)
    val (cur, surv, conv) =
      peelLoop(if (checkpointEvery > 0) und0.localCheckpoint(true) else und0,
        k, rounds, checkpointEvery)
    val coreDeg = cur
      .select(col("a").as("id"))
      .union(cur.select(col("b").as("id")))
      .groupBy("id")
      .agg(count(lit(1)).as("core_deg"))
    surv
      .join(coreDeg, Seq("id"), "left_outer")
      .crossJoin(broadcast(conv))
      .select(
        col("id"),
        coalesce(col("core_deg"), lit(0L)).as("core_deg"),
        col("converged"))
  }

  /** [[kCore]]'s RESUME face: the surviving EDGE set itself, (a, b,
    * converged) with a < b — what a caller seeing `converged=false` feeds
    * back (as srcCol="a", dstCol="b") to continue peeling from where the
    * previous run stopped instead of recomputing every pass from scratch
    * (peeling is monotone, so peel(peel(E, r1), r2) == peel(E, r1+r2) —
    * law-tested). The normalization re-applied on re-entry is a no-op on
    * an already-normalized frame. `converged` is a constant column from a
    * 1-row broadcast, not a per-row computation. */
  def kCoreEdges(
      edges: DataFrame,
      k: Int,
      rounds: Int = 4,
      srcCol: String = "src",
      dstCol: String = "dst",
      checkpointEvery: Int = 1): DataFrame = {
    val und0 = normalizeUndirected(edges, srcCol, dstCol)
    val (cur, _, conv) =
      peelLoop(if (checkpointEvery > 0) und0.localCheckpoint(true) else und0,
        k, rounds, checkpointEvery)
    cur.crossJoin(broadcast(conv)).select(col("a"), col("b"), col("converged"))
  }

  /** Full coreness decomposition — per-node max k such that the node
    * survives the k-core (the standard degeneracy-ordering readout; [[kCore]]
    * answers one k, this sweeps k = 1..maxK). Every node of the edge frame
    * has coreness ≥ 1 by construction (it carries an edge), so level 1 is
    * free; levels nest (the k-core is a subgraph of the (k−1)-core), so
    * each level peels FROM THE PREVIOUS LEVEL'S SURVIVING EDGES — the sweep
    * costs one peel chain over shrinking graphs, not maxK independent
    * full-graph peels. `converged` ANDs every level's flag: when false,
    * re-run with higher `rounds` (or higher maxK if the top level is still
    * dense — a maxK-core with edges left means coreness saturates at maxK).
    *
    * Scale shape: inherits [[kCore]]'s per-pass shape (degree aggregate +
    * two survivor joins, all node-keyed equi-joins); each level boundary
    * pins the (shrinking, already-shuffled) edge frame so the ~5×-per-pass
    * plan fan-out never crosses levels. Output: (id, coreness, converged),
    * one row per node of the normalized edge frame. */
  def coreness(
      edges: DataFrame,
      maxK: Int,
      rounds: Int = 4,
      srcCol: String = "src",
      dstCol: String = "dst",
      checkpointEvery: Int = 1): DataFrame = {
    require(maxK >= 1, "maxK must be positive")
    // pinned once: read by the level-1 node set AND referenced ~5x by the
    // first peel round (the kCore entry-pin rationale)
    val und0 = normalizeUndirected(edges, srcCol, dstCol)
    val und = if (checkpointEvery > 0) und0.localCheckpoint(true) else und0
    // level 1 needs no peel: every node of an edge frame has degree >= 1
    val lvl1 = und.select(col("a").as("id")).union(und.select(col("b").as("id")))
      .distinct().withColumn("__k", lit(1))
    var cur = und
    var levels = Seq(lvl1)
    var convAll = true
    (2 to maxK).foreach { k =>
      val (nextE, surv, conv) = peelLoop(cur, k, rounds, checkpointEvery)
      // pin at the level boundary: the next level's peel references this
      // frame ~5x per pass, and the level's survivor readout reads it too —
      // without the pin the per-level plans would nest multiplicatively
      cur = nextE.localCheckpoint(true)
      levels :+= surv.withColumn("__k", lit(k))
      // fold the 1-row flag to a driver Boolean at the SAME (already eager)
      // boundary: a crossJoin chain of flag frames would grow plan depth
      // linearly in maxK while everything else at the boundary stays pinned
      convAll = convAll && conv.head().getBoolean(0)
    }
    levels.reduce(_ unionByName _)
      .groupBy("id")
      .agg(max(col("__k")).cast("long").as("coreness"))
      .crossJoin(broadcast(
        lvl1.sparkSession.sql(s"SELECT ${convAll} AS converged")))
  }

  /** Undirected normalization shared by the peel family: drop nulls and
    * self-loops, orient low→high, dedup. Idempotent — feeding a returned
    * (a, b) frame back re-normalizes to itself. */
  private def normalizeUndirected(
      edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
      .where(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
      .distinct()

  /** The fixed-`rounds` peel loop over a normalized (a, b) frame. Returns
    * (final edges, last pass's survivor nodes, 1-row converged frame). The
    * survivor frame is deg≥k over the LAST PASS'S INPUT — it can include
    * nodes the final restriction isolated (core_deg 0 when unconverged),
    * which is [[kCore]]'s documented output shape. */
  private def peelLoop(
      und: DataFrame,
      k: Int,
      rounds: Int,
      checkpointEvery: Int): (DataFrame, DataFrame, DataFrame) = {
    require(k >= 1, "k must be positive")
    require(rounds >= 1, "need at least one peel round")
    // callers pin the entry frame (round 1 references it ~5x): peelLoop
    // itself never re-materializes, so an already-pinned level boundary
    // (coreness) is not copied a second time
    var cur = und
    var prev = und
    var surv: DataFrame = null
    (1 to rounds).foreach { i =>
      val deg = cur
        .select(col("a").as("id"))
        .union(cur.select(col("b").as("id")))
        .groupBy("id")
        .agg(count(lit(1)).as("deg"))
      surv = deg.where(col("deg") >= k).select("id")
      prev = cur
      cur = cur
        .join(surv.select(col("id").as("a")), Seq("a"))
        .join(surv.select(col("id").as("b")), Seq("b"))
        .select("a", "b")
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < rounds)
        cur = cur.localCheckpoint(true)
    }
    // edge sets only shrink, so equal cardinality == equal set == fixpoint
    val conv = prev
      .agg(count(lit(1)).as("__pc"))
      .crossJoin(cur.agg(count(lit(1)).as("__cc")))
      .select((col("__cc") === col("__pc")).as("converged"))
    (cur, surv, conv)
  }

  /** Per-node triangle participation counts over the undirected view of an
    * edge frame — the local-clustering signal that separates "hub that
    * fans out" (PageRank-high, triangle-low) from "member of a tight
    * cluster" (an infrastructure clique in a hunt graph: observed-data,
    * network-traffic and its addresses all mutually linked).
    *
    * Scale shape: edges are oriented low→high by the (degree, id) total
    * order, so every triangle is enumerated exactly once from its
    * lowest-degree corner and the wedge self-join fans out per vertex as
    * C(out-deg, 2) where out-deg counts only HIGHER-degree neighbors —
    * O(E^1.5) wedges in the worst case instead of the Θ(Σ deg²) a naive
    * id-ordering hits on hub-heavy graphs (a 10⁶-degree hub contributes
    * zero wedges here; with id-ordering it contributes ~5·10¹¹). Both
    * joins are hash-partitioned equi-joins on vertex ids; no state beyond
    * the edge list itself. Orientation changes only the join order, never
    * the triangle set, so results are layout- and degree-independent. */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String = "src",
      dstCol: String = "dst"): DataFrame = {
    // pin the normalized edge frame (read by the degree build AND the
    // orientation join) and the oriented frame (read 3x: both wedge sides
    // and the closing join) — unpinned, the scan subtree re-executed 3x
    // (measured 3 identical >100-task jobs on the q_stix fixture store)
    val und = edges
      .select(col(srcCol).as("s"), col(dstCol).as("d"))
      .where(col("s").isNotNull && col("d").isNotNull && col("s") =!= col("d"))
      .select(least(col("s"), col("d")).as("a"), greatest(col("s"), col("d")).as("b"))
      .distinct()
      .localCheckpoint(true)
    val deg = und
      .select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
      .groupBy("id")
      .agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(
        when(
          struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(
            col("a").as("u"),
            col("b").as("v"),
            struct(col("db").as("kd"), col("b").as("kid")).as("kv")))
          .otherwise(
            struct(
              col("b").as("u"),
              col("a").as("v"),
              struct(col("da").as("kd"), col("a").as("kid")).as("kv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.kv").as("kv"))
      .localCheckpoint(true)
    // wedge (u, v1, v2): two out-edges of u with kv1 < kv2; closed iff the
    // oriented edge v1→v2 exists (it is oriented that way because the
    // orientation key order kv1 < kv2 is total and orientation-consistent)
    val wedges = oriented
      .select(col("u"), col("v").as("v1"), col("kv").as("k1"))
      .join(oriented.select(col("u"), col("v").as("v2"), col("kv").as("k2")), Seq("u"))
      .where(col("k1") < col("k2"))
      .select(col("u"), col("v1"), col("v2"))
    val tri = wedges.join(
      oriented.select(col("u").as("v1"), col("v").as("v2")),
      Seq("v1", "v2"))
    tri
      .select(explode(array(col("u"), col("v1"), col("v2"))).as("id"))
      .groupBy("id")
      .agg(count(lit(1)).as("triangles"))
  }
}
