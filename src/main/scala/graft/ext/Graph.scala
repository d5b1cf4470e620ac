package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph operators for corpus curation (beyond-reference, SURVEY.md
  * §2.8). The canonical use is a link-graph quality prior: web-scale
  * pipelines rank crawl domains by PageRank over the hyperlink graph
  * and use the score as a per-document quality signal (the
  * CommonCrawl/C4 lineage of "keep pages from reputable domains").
  *
  * Integer-exact PageRank: all arithmetic is scaled BIGINT with
  * truncating division — score sums are order-independent integer
  * sums, so the result is bit-identical across partitionings, cluster
  * sizes, and engines (judged value-exact vs a DuckDB oracle, x169).
  * The float formulation would drift by accumulation order on every
  * shuffle.
  */
object Graph {

  /** Fixed-iteration PageRank (damping 0.85) on `edges(src, dst)`.
    *
    * Node set = DISTINCT src. Pass a symmetrized edge list for an
    * undirected graph — that also guarantees every node has out-degree
    * >= 1, so no dangling-mass redistribution is needed (nodes
    * appearing only as dst would silently leak rank mass; symmetrize
    * or pre-filter them).
    *
    * Update rule, all BIGINT with truncating division:
    *   score_0(v)   = scale div N
    *   score_k+1(v) = (score_0 * 15) div 100
    *                  + (85 * sum_u->v(score_k(u) div deg(u))) div 100
    *
    * Scale shape: edges and per-source degrees are joined ONCE and
    * checkpointed; each iteration is one equi-join of that frame with
    * the current scores on src (co-partitioned shuffle, AQE-friendly)
    * plus a keyed sum on dst — the standard distributed PageRank
    * round. Scores are locally checkpointed every `checkpointEvery`
    * rounds (default: every round) with eager release of the previous
    * frontier, keeping lineage and analysis cost flat on long runs.
    * Leaving rounds unmaterialized (`checkpointEvery` > iterations)
    * measured NO faster here and can regress badly: the optimizer sees
    * small stats for the per-round contribution aggregate and plans
    * nested broadcast joins whose build sides re-execute the chain —
    * measured 8x slower on the x169 graph. The only driver traffic is
    * the node COUNT (one scalar, once).
    *
    * With `allNodesReceive = true` the caller asserts every node has
    * at least one in-edge (always true for a symmetrized edge list),
    * and the per-round left join that re-attaches contribution-less
    * nodes is skipped — one fewer shuffle per round; a node that DOES
    * lack in-edges would silently drop from the result, so the flag
    * stays off unless the graph shape guarantees it. */
  /** Broadcast hint for the NODE-SIZED side of the per-round joins in
    * the iterative operators (pagerank / label propagation / k-core /
    * CC): a localCheckpoint boundary erases plan statistics (a
    * LogicalRDD defaults to "unknown = huge"), so without the hint
    * Spark plans SortMergeJoin and re-exchanges + re-sorts the FULL
    * checkpointed edge table every round — measured 20-42x task-time
    * blowups at sf1 on this family, against ~10x for every
    * non-iterative operator. The operators all know their node (or
    * arc) count on the driver already, so the hint is size-GATED:
    * under the cap (~2M rows, a few tens of MB as an executor hash
    * relation) the node side broadcasts and the edge table is never
    * shuffled again; above it the shuffle join IS the right plan
    * (a billion-node score table must not be broadcast). */
  private[ext] val BroadcastNodeCap = 2000000L
  private[ext] def nodeSide(df: DataFrame, rows: Long): DataFrame =
    if (rows <= BroadcastNodeCap) broadcast(df) else df

  /** ORDER-PRESERVING dictionary encoding of STRING node ids to dense
    * longs for the iterative operators (guide §2.2/§2.3: narrower
    * keys): every per-round join/aggregate/broadcast then runs on
    * 8-byte longs instead of strings — the per-round broadcast build
    * gets Spark's specialized long-keyed hash relation and the
    * (dst)/(dst,lbl) aggregates hash fixed-width keys; measured 10x
    * heavier string broadcast builds at sf1 were the round-15 flag on
    * this family. gid is assigned by [[Ids.contiguousIds]] over the
    * SORTED distinct node set, so gid order == Spark string order —
    * the proof labelPropagation's min-label tie-break needs:
    * min(gid) decodes to exactly min(string). PageRank-family scores
    * depend only on graph structure, so any bijection preserves them;
    * LPA additionally needs the monotonicity. Encoding is gated on the
    * same node cap as the broadcast hints (a billion-node dictionary
    * must not be built around a shuffle-regime plan) and on the node
    * column actually being a string. Decode is one broadcast join on
    * the node-sized dictionary at output time. */
  private[ext] def nodeDict(nodeNames: DataFrame): DataFrame =
    CacheRegistry.pin(Ids.contiguousIds(nodeNames, "name"))

  def pageRank(edges: DataFrame, iterations: Int,
               scale: Long = 1000000000000L,
               checkpointEvery: Int = 1,
               allNodesReceive: Boolean = false): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64]; got $iterations")
    val arcsIn = edges.select(col("src"), col("dst"))
    // node set + count FIRST (one node-sized aggregate over the raw
    // arcs): gates both the broadcast hint and the dictionary
    val nodesRaw = CacheRegistry.checkpoint(
      arcsIn.select(col("src").as("name")).distinct())
    val n = nodesRaw.count() // one driver scalar
    require(n > 0, "pageRank needs a non-empty edge list")
    // string node ids under the broadcast cap run the rounds on dense
    // longs (see [[nodeDict]])
    val isStr = arcsIn.schema("src").dataType ==
      org.apache.spark.sql.types.StringType
    val dict: Option[DataFrame] =
      if (isStr && n <= BroadcastNodeCap) Some(nodeDict(nodesRaw))
      else None
    // The arc table is the ONLY corpus-sized frame, and its build costs
    // exactly ONE exchange in the broadcast regime: repartition(dst)
    // BEFORE the dedup (subset partitioning satisfies the distinct's
    // clustering — the LPA trick), with the encode joins fused into the
    // same pass. It is a PIN, not a checkpoint — a localCheckpoint
    // erases partitioning (UnknownPartitioning on the LogicalRDD, read
    // off the committed round-15 plans) while an InMemoryRelation
    // preserves it, so every round's contribution aggregate on dst is
    // exchange-free (guide §2.4). Arcs no longer carry a deg column:
    // score div deg is a function of the SOURCE node alone, so the
    // division moved to the node-sized broadcast side (sdd below) —
    // the round-15 eDeg shape paid an arc-sized deg-attach join at
    // build and shipped an extra long per arc for nothing. Above the
    // cap the rounds sort-merge on src and re-exchange either way, so
    // the plain distinct checkpoint is kept there.
    val arcs = dict match {
      case Some(d) => CacheRegistry.pin(
        arcsIn.join(broadcast(d.select(col("name").as("sname"),
            col("gid").as("sgid"))), arcsIn("src") === col("sname"))
          .join(broadcast(d.select(col("name").as("dname"),
            col("gid").as("dgid"))), arcsIn("dst") === col("dname"))
          .select(col("sgid").as("src"), col("dgid").as("dst"))
          .repartition(col("dst")).distinct())
      case None =>
        if (n <= BroadcastNodeCap)
          CacheRegistry.pin(arcsIn.repartition(col("dst")).distinct())
        else CacheRegistry.checkpoint(arcsIn.distinct())
    }
    // the eager checkpoint materializes the arcs pin as a side effect
    // (full scan); deg is node-sized — lineage truncation keeps every
    // round's broadcast-build plan flat
    val deg = CacheRegistry.checkpoint(
      arcs.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    val degR = deg.select(col("node").as("dnode"), col("deg"))
    val init = scale / n
    val base = init * 15L / 100L

    var cur = deg.select(col("node"), lit(init).as("score"))
    var lastChk: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      // per-source contribution computed on the NODE-SIZED side before
      // the arc join: score div deg is constant across a source's
      // out-arcs, so dividing here is |nodes| divisions instead of
      // |arcs|, and the arc join ships one pre-divided long
      val sdd = cur.join(nodeSide(degR, n), cur("node") === col("dnode"))
        .select(cur("node").as("node"), expr("score div deg").as("sdd"))
      val contrib = arcs
        .join(nodeSide(sdd, n), arcs("src") === sdd("node"))
        .groupBy(col("dst"))
        .agg(sum(col("sdd")).as("c"))
      cur =
        if (allNodesReceive)
          contrib.select(col("dst").as("node"),
            (lit(base) + expr("85 * c div 100")).as("score"))
        else
          // contrib (node-sized, consumed once, materialized by this
          // round's checkpoint) broadcasts under the same gate, so the
          // checkpointed deg side never shuffles or sorts per round
          deg.select(col("node"))
            .join(nodeSide(contrib, n), col("node") === col("dst"), "left")
            .select(col("node"),
              (lit(base) + expr("85 * coalesce(c, 0L) div 100")).as("score"))
      if (i % checkpointEvery == 0 && i < iterations) {
        val chk = CacheRegistry.checkpoint(cur)
        lastChk.foreach(CacheRegistry.release)
        lastChk = Some(chk)
        cur = chk
      }
    }
    dict match {
      case Some(d) => // decode: one broadcast join on the node-sized dict
        cur.join(broadcast(d), cur("node") === d("gid"))
          .select(col("name").as("node"), col("score")).orderBy("node")
      case None => cur.orderBy("node")
    }
  }

  /** PERSONALIZED PageRank: teleport mass lands only on the `seeds`
    * set, so scores measure proximity to the seeds rather than global
    * centrality — the "trusted domains" propagation: seed the crawl
    * graph with vetted sites and every node's score becomes a
    * trust/relevance prior for curation (the TrustRank shape,
    * Gyöngyi et al. VLDB'04).
    *
    * Same integer-exact update as [[pageRank]] with the base term
    * per-node: score_0 = scale div |S| on seeds else 0, and each
    * round adds base(v) = seed(v) ? (scale div |S|)·15 div 100 : 0.
    * All BIGINT, truncating division, bit-identical across engines
    * and partitionings.
    *
    * Scale shape identical to [[pageRank]] (edges+degrees
    * checkpointed once, one equi-join + keyed sum per round,
    * per-round checkpoint with eager release); the seed flag rides
    * the checkpointed node frame, so personalization adds zero extra
    * shuffles. Requires a symmetrized edge list like [[pageRank]].
    *
    * `seeds`: one column `node`; members not in the graph are
    * ignored. Output: (node, score), ordered by node. */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iterations: Int,
                           scale: Long = 1000000000000L,
                           checkpointEvery: Int = 1): DataFrame = {
    require(checkpointEvery >= 1, "checkpointEvery must be positive")
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64]; got $iterations")
    val arcsIn = edges.select(col("src"), col("dst"))
    // node set + count first (same build shape as [[pageRank]])
    val namesRaw = CacheRegistry.checkpoint(
      arcsIn.select(col("src").as("name")).distinct())
    val nAll = namesRaw.count() // gates the per-round broadcast hint
    val isStr = arcsIn.schema("src").dataType ==
      org.apache.spark.sql.types.StringType
    val dict: Option[DataFrame] =
      if (isStr && nAll <= BroadcastNodeCap) Some(nodeDict(namesRaw))
      else None
    // one-exchange arc build, encode fused, dst-partitioned PIN in the
    // broadcast regime — see [[pageRank]]; arcs carry no deg column
    val arcs = dict match {
      case Some(d) => CacheRegistry.pin(
        arcsIn.join(broadcast(d.select(col("name").as("sname"),
            col("gid").as("sgid"))), arcsIn("src") === col("sname"))
          .join(broadcast(d.select(col("name").as("dname"),
            col("gid").as("dgid"))), arcsIn("dst") === col("dname"))
          .select(col("sgid").as("src"), col("dgid").as("dst"))
          .repartition(col("dst")).distinct())
      case None =>
        if (nAll <= BroadcastNodeCap)
          CacheRegistry.pin(arcsIn.repartition(col("dst")).distinct())
        else CacheRegistry.checkpoint(arcsIn.distinct())
    }
    val deg = arcs.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    // the seed flag rides the node frame (encoded when the dictionary
    // is on), so personalization adds zero extra shuffles; the eager
    // checkpoint materializes the arcs pin as a side effect
    val seedSet = dict match {
      case Some(d) =>
        seeds.select(col("node").as("sdname")).distinct()
          .join(broadcast(d), col("sdname") === d("name"))
          .select(col("gid").as("node"), lit(1).as("sd"))
      case None =>
        seeds.select(col("node"), lit(1).as("sd")).distinct()
    }
    val nodes = CacheRegistry.checkpoint(
      deg.join(seedSet, Seq("node"), "left")
        .select(col("node"), col("deg"),
          coalesce(col("sd"), lit(0)).as("sd")))
    val ns = nodes.where(col("sd") === 1).count() // one driver scalar
    require(ns > 0, "personalizedPageRank needs >= 1 seed in the graph")
    val degR = nodes.select(col("node").as("dnode"), col("deg"))
    val init = scale / ns
    val base = init * 15L / 100L

    var cur = nodes.select(col("node"),
      (col("sd") * init).cast("bigint").as("score"))
    var lastChk: Option[DataFrame] = None
    for (i <- 1 to iterations) {
      // node-side division before the arc join — see [[pageRank]]
      val sdd = cur.join(nodeSide(degR, nAll), cur("node") === col("dnode"))
        .select(cur("node").as("node"), expr("score div deg").as("sdd"))
      val contrib = arcs
        .join(nodeSide(sdd, nAll), arcs("src") === sdd("node"))
        .groupBy(col("dst"))
        .agg(sum(col("sdd")).as("c"))
      cur = nodes.select(col("node"), col("sd"))
        .join(nodeSide(contrib, nAll), col("node") === col("dst"), "left")
        .select(col("node"),
          (col("sd") * base + expr("85 * coalesce(c, 0L) div 100"))
            .cast("bigint").as("score"))
      if (i % checkpointEvery == 0 && i < iterations) {
        val chk = CacheRegistry.checkpoint(cur)
        lastChk.foreach(CacheRegistry.release)
        lastChk = Some(chk)
        cur = chk
      }
    }
    dict match {
      case Some(d) => // decode: one broadcast join on the node-sized dict
        cur.join(broadcast(d), cur("node") === d("gid"))
          .select(col("name").as("node"), col("score")).orderBy("node")
      case None => cur.orderBy("node")
    }
  }

  /** Synchronous label propagation (community detection) on a
    * SYMMETRIZED `edges(src, dst)` list.
    *
    * label_0(v) = v; each round every node adopts the label held by
    * the plurality of its neighbors, ties broken toward the SMALLEST
    * label — the deterministic variant of Raghavan et al.'s LPA (the
    * classic formulation breaks ties randomly, which would never
    * survive a bit-exact cross-engine compare). Fixed `iterations`
    * rounds, no convergence test — communities stabilize in a few
    * rounds and a fixed horizon keeps the plan finite.
    *
    * The plurality argmax is one aggregate: min(struct(-count,
    * label)) — struct ordering gives max count then lexicographic
    * min label, with no per-node window.
    *
    * Scale shape identical to [[pageRank]]: the edge list is
    * checkpointed once; each round is an equi-join of edges with the
    * current labels on src plus two keyed aggregates on dst; label
    * frontiers are checkpointed per round with eager release. A node
    * with no in-edge would drop out — symmetrize, as required.
    */
  def labelPropagation(edges: DataFrame, iterations: Int): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1, 64]; got $iterations")
    val arcs = edges.select(col("src"), col("dst"))
    // node set + count FIRST (one node-sized aggregate over the raw
    // arcs): it gates both the broadcast hint and the dictionary, and
    // with the dictionary in hand the label INIT is the dictionary
    // itself — the old separate distinct-over-pinned-arcs init job
    // disappears
    val nodesRaw = CacheRegistry.checkpoint(
      arcs.select(col("src").as("name")).distinct())
    val n = nodesRaw.count() // gates the per-round broadcast hint
    val isStr = arcs.schema("src").dataType ==
      org.apache.spark.sql.types.StringType
    // long-encoded rounds under the broadcast gate (see [[nodeDict]]):
    // label_0(v) = v and the plurality argmax tie-breaks toward the
    // SMALLEST label, so the encoding must be order-preserving —
    // contiguousIds assigns gid by sorted name, hence
    // min(struct(-c, gid)) decodes to exactly min(struct(-c, name))
    val dict: Option[DataFrame] =
      if (isStr && n <= BroadcastNodeCap) Some(nodeDict(nodesRaw))
      else None
    // dst-partitioned BEFORE the dedup (the aggregate only needs
    // same-key co-location, which the subset partitioning provides, so
    // the build still costs ONE exchange — now hashing longs when the
    // dictionary is on), and PINNED rather than checkpointed (a
    // localCheckpoint erases partitioning — UnknownPartitioning on the
    // LogicalRDD): in the broadcast regime the per-round join preserves
    // this partitioning and BOTH per-round aggregates — (dst, lbl)
    // counts and the per-dst argmax — run exchange-free (guide §2.4).
    // Above the cap the rounds sort-merge on src and re-exchange either
    // way, so nothing is lost. The edge table is loop-invariant with a
    // shallow lineage, so a checkpoint's lineage truncation buys
    // nothing here.
    val e = CacheRegistry.pin(dict match {
      case Some(d) =>
        arcs.join(broadcast(d.select(col("name").as("sname"),
            col("gid").as("sgid"))), arcs("src") === col("sname"))
          .join(broadcast(d.select(col("name").as("dname"),
            col("gid").as("dgid"))), arcs("dst") === col("dname"))
          .select(col("sgid").as("src"), col("dgid").as("dst"))
          .repartition(col("dst")).distinct()
      case None =>
        arcs.repartition(col("dst")).distinct()
    })
    var cur: DataFrame = dict match {
      case Some(d) => CacheRegistry.checkpoint(
        d.select(col("gid").as("node"), col("gid").as("lbl")))
      case None => CacheRegistry.checkpoint(
        nodesRaw.select(col("name").as("node"),
          col("name").as("lbl")))
    }
    var lastChk: Option[DataFrame] = Some(cur)
    for (i <- 1 to iterations) {
      cur = e.join(nodeSide(cur, n), e("src") === cur("node"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
        .select(col("node"), col("m.l").as("lbl"))
      if (i < iterations) {
        val chk = CacheRegistry.checkpoint(cur)
        lastChk.foreach(CacheRegistry.release)
        lastChk = Some(chk)
        cur = chk
      }
    }
    dict match {
      case Some(d) => // decode node AND label via two dict broadcasts
        val dn = d.select(col("name").as("n_name"), col("gid").as("n_gid"))
        val dl = d.select(col("name").as("l_name"), col("gid").as("l_gid"))
        cur.join(broadcast(dn), cur("node") === col("n_gid"))
          .join(broadcast(dl), cur("lbl") === col("l_gid"))
          .select(col("n_name").as("node"), col("l_name").as("label"))
          .orderBy("node")
      case None =>
        cur.select(col("node"), col("lbl").as("label")).orderBy("node")
    }
  }

  /** Per-node triangle counts on an undirected graph, via the
    * degree-oriented wedge join (the standard distributed algorithm:
    * Suri & Vassilvitskii's MR triangle counting).
    *
    * Edges are first canonicalized to (lo, hi) id pairs, then
    * RE-oriented from the (degree, id)-smaller endpoint to the larger
    * — so every wedge is generated at its lowest-degree apex and the
    * per-apex pair blowup is bounded by the ORIENTED out-degree
    * (O(sqrt(m)) on any graph), not the raw degree: a celebrity node
    * with 10M neighbors generates no wedges at all unless its
    * neighbors are even hotter. Each triangle is counted exactly once
    * (its unique apex with two out-edges), then credited to all three
    * corners.
    *
    * Scale shape: degree agg, one equi-join to orient, the wedge
    * self-join keyed on the apex, and the closure probe as an
    * equi-join against the canonical edge set. No windows; nothing
    * quadratic in raw degree.
    *
    * Output: (node, triangles) for nodes in >= 1 triangle, ordered by
    * node. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val e = CacheRegistry.pin(edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .where(col("lo") =!= col("hi")).distinct())
    val deg = e.select(col("lo").as("node"))
      .union(e.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = CacheRegistry.pin(e
      .join(deg.select(col("node").as("lo"), col("deg").as("dlo")), "lo")
      .join(deg.select(col("node").as("hi"), col("deg").as("dhi")), "hi")
      .select(
        when(struct(col("dlo"), col("lo")) < struct(col("dhi"), col("hi")),
          col("lo")).otherwise(col("hi")).as("src"),
        when(struct(col("dlo"), col("lo")) < struct(col("dhi"), col("hi")),
          col("hi")).otherwise(col("lo")).as("dst")))
    val wedges = oriented.as("w1")
      .join(oriented.as("w2"), col("w1.src") === col("w2.src")
        && col("w1.dst") < col("w2.dst"))
      .select(col("w1.src").as("a"), col("w1.dst").as("b"),
        col("w2.dst").as("c"))
    val tri = wedges.join(e,
      least(col("b"), col("c")) === col("lo") &&
        greatest(col("b"), col("c")) === col("hi"))
      .select(col("a"), col("b"), col("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
      .orderBy("node")
  }

  /** k-CORE PEELING trajectory: `rounds` synchronous peel steps on a
    * SYMMETRIZED distinct edge list — each round drops every node
    * whose current degree is below k, then restricts the edges to
    * surviving endpoints — reporting (n_nodes, n_arcs) after every
    * round. The dense-core extractor behind spam-farm detection and
    * community seeding; the trajectory (not just the fixpoint) is the
    * output because WHERE the curve flattens says how deep the
    * genuine core starts. A fixed round count keeps the result
    * deterministic and oracle-checkable (the true k-core is the
    * fixpoint; the curve flattening at round r < rounds proves
    * convergence in-band).
    *
    * Scale shape: per round, one keyed degree count and two
    * semi-joins (src, dst) against the surviving-node set — the
    * standard distributed peel; each round's edge frame is
    * checkpointed with eager release of the previous one (same
    * rationale as [[pageRank]]: unmaterialized rounds re-execute the
    * chain under nested broadcasts). The only driver traffic is TWO
    * SCALARS per round — counting a checkpointed frame costs nothing
    * extra and lets the superseded round be unpersisted immediately
    * (a lazily-unioned trajectory would have to keep every round's
    * blocks alive to the end).
    *
    * Output: (round, n_nodes, n_arcs), round 1..rounds; n_nodes
    * counts nodes with a surviving arc, n_arcs counts DIRECTED arcs
    * (2x undirected edges). */
  def kCoreTrajectory(edges: DataFrame, k: Long, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1 && rounds <= 16,
      s"need k >= 1 and 1 <= rounds <= 16; got k=$k rounds=$rounds")
    val spark = edges.sparkSession
    import spark.implicits._
    // symmetrize internally (same contract as degreeAssortativity /
    // richClub): degree is counted from src alone, so a caller passing
    // canonical lo<hi edges would silently halve degrees — the
    // union+distinct makes any orientation convention correct, and is
    // idempotent (a no-op distinct) on an already-symmetric list
    // both orientations via ONE explode instead of union(edges,
    // edges.mirror): a union executes the caller's (possibly
    // un-checkpointed, e.g. x328's lineitem⨝orders) edge subtree once
    // PER BRANCH in every pass that scans it — explode emits the same
    // two arcs per input row in a single execution
    val sym = edges.select(explode(array(
        struct(col("src").as("s"), col("dst").as("d")),
        struct(col("dst").as("s"), col("src").as("d")))).as("e"))
      .select(col("e.s").as("src"), col("e.d").as("dst"))
    // node set + count first: gates the broadcast hint for every round
    // (nodes only shrink while peeling) and the dictionary; the output
    // is (round, n_nodes, n_arcs) COUNTS only, so any bijective
    // encoding is transparent and nothing ever decodes
    val nodesRaw = CacheRegistry.checkpoint(
      sym.select(col("src").as("name")).distinct())
    val n0 = nodesRaw.count()
    val isStr = sym.schema("src").dataType ==
      org.apache.spark.sql.types.StringType
    val dict: Option[DataFrame] =
      if (isStr && n0 <= BroadcastNodeCap) Some(nodeDict(nodesRaw))
      else None
    // src-partitioned before the dedup (same one-exchange build as the
    // plain distinct — the dedup aggregate is satisfied by the subset
    // partitioning) and held as a PIN — a localCheckpoint would erase
    // the partitioning (round-15 advice: the old repartition-then-
    // checkpoint was a no-op). The per-round semi-joins preserve the
    // partitioning in the broadcast regime, so every round's edge
    // frame STAYS src-partitioned and its degree aggregate runs
    // exchange-free (guide §2.4) — the old per-round checkpoint paid
    // one Exchange hashpartitioning(src) per round for the rebuilt
    // frame.
    var e = CacheRegistry.pin(dict match {
      case Some(d) =>
        sym.join(broadcast(d.select(col("name").as("sname"),
            col("gid").as("sgid"))), sym("src") === col("sname"))
          .join(broadcast(d.select(col("name").as("dname"),
            col("gid").as("dgid"))), sym("dst") === col("dname"))
          .select(col("sgid").as("src"), col("dgid").as("dst"))
          .repartition(col("src")).distinct()
      case None => sym.repartition(col("src")).distinct()
    })
    // ONE degree aggregation per round serves BOTH consumers: the
    // round's (n_nodes, n_arcs) trajectory row and the next round's
    // keep set. deg stays a CHECKPOINT, not a pin — deliberately: the
    // next round's edge frame references deg (via keep), and deg
    // references this round's edge frame, so a pinned (lineage-
    // carrying) deg makes the logical plan DOUBLE per round —
    // analysis/canonicalization of the 2^rounds tree hangs the driver
    // long before execution starts (measured: the all-pins variant
    // never finished round 3 at sf0.1). Checkpointing the NODE-SIZED
    // deg truncates exactly the doubling branch for the cost of
    // materializing a 16k-row frame, while the arc-sized e stays a
    // PIN whose src partitioning the broadcast semi-joins preserve —
    // plan growth is linear in rounds and every round's degree
    // aggregate is exchange-free.
    var deg = CacheRegistry.checkpoint(
      e.groupBy("src").agg(count(lit(1)).as("deg")))
    val traj = (1 to rounds).map { r =>
      val keep = deg.where(col("deg") >= k).select(col("src").as("node"))
      val prevE = e; val prevDeg = deg
      e = CacheRegistry.pin(
        prevE.join(nodeSide(keep.select(col("node").as("src")), n0),
            Seq("src"), "left_semi")
          .join(nodeSide(keep.select(col("node").as("dst")), n0),
            Seq("dst"), "left_semi")
          .select("src", "dst"))
      // the eager checkpoint materializes this round's e pin (full
      // scan) and truncates deg's lineage; only then is the superseded
      // generation released (a pin read during its parent's release
      // could not recompute — see CacheRegistry.release's caveat)
      deg = CacheRegistry.checkpoint(
        e.groupBy("src").agg(count(lit(1)).as("deg")))
      CacheRegistry.release(prevE)
      CacheRegistry.release(prevDeg)
      val row = deg.agg(count(lit(1)).as("n_nodes"),
        sum(col("deg")).as("n_arcs")).collect().head
      (r.toLong, row.getLong(0),
        if (row.isNullAt(1)) 0L else row.getLong(1))
    }
    CacheRegistry.release(e)
    CacheRegistry.release(deg)
    traj.toDF("round", "n_nodes", "n_arcs").orderBy("round")
  }

  /** DEGREE ASSORTATIVITY of an undirected edge list (one row): the
    * Pearson correlation of endpoint degrees over directed arcs
    * (each undirected edge contributes both orientations — the
    * standard convention, Newman 2002). Positive = hubs link to
    * hubs (social-graph shape), negative = hubs link to leaves
    * (star/crawl shape) — the one-number "which kind of graph is
    * this" audit run before choosing between the hub-oriented and
    * leaf-oriented partitioning strategies.
    *
    * Integer-exact WITHOUT a square root: orientation symmetry makes
    * the two endpoint-degree marginals identical, so
    * var(x) = var(y) and r = cov/var exactly —
    * r_ppm = (M·Σxy - Σx·Σy) · 1e6 div (M·Σxx - Σx·Σx), the ×1e6
    * numerator widened to DECIMAL(38,0) (DuckDB twin: HUGEINT; the
    * moment sums themselves are BIGINT, exact to ~1e6-degree hubs on
    * ~1e9-arc graphs).
    *
    * Scale shape: one degree count, one equi-join of arcs to degrees
    * at each endpoint, one global moment aggregate — the same
    * two-shuffle budget as a PageRank round, never a pair join.
    *
    * Output: (n_nodes, n_arcs, r_ppm); r_ppm NULL on a degree-regular
    * graph (zero variance, the textbook undefined case). */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val arcs = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = arcs.groupBy("src").agg(count(lit(1)).as("deg"))
    arcs
      .join(deg.select(col("src"), col("deg").as("dx")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("dy")),
        Seq("dst"))
      .agg(countDistinct("src").as("n_nodes"),
        count(lit(1)).as("n_arcs"),
        sum("dx").as("sx"), sum("dy").as("sy"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select(col("n_nodes"), col("n_arcs"),
        // widen BEFORE the moment products — M·Σxy is O(M²·deg²)
        expr("CAST((CAST(n_arcs AS DECIMAL(38,0)) * sxy" +
          " - CAST(sx AS DECIMAL(38,0)) * sy) * 1000000" +
          " div nullif(CAST(n_arcs AS DECIMAL(38,0)) * sxx" +
          " - CAST(sx AS DECIMAL(38,0)) * sx, 0)" +
          " AS BIGINT)").as("r_ppm"))
  }

  /** LOCAL CLUSTERING COEFFICIENT per node:
    * lcc_ppm = 2·triangles·1e6 div (deg·(deg−1)) over every node of
    * degree ≥ 2 (nodes in no triangle score 0, not absent) — the
    * per-node "is my neighborhood a clique or a star" refinement of
    * [[triangleCount]]'s corpus number; the bimodality of this column
    * separates community cores from pure hubs and is the standard
    * precursor to a k-truss/community cut. deg·(deg−1) stays BIGINT —
    * exact to ~3e9-degree hubs.
    *
    * Scale shape: [[triangleCount]]'s degree-oriented wedge join does
    * the heavy lifting (its cost envelope, unchanged); this adds one
    * degree count and one left equi-join on the bounded (node) table.
    *
    * Output: (node, deg, triangles, lcc_ppm) ordered by node. */
  def localClustering(edges: DataFrame): DataFrame = {
    val e = edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"))
      .where(col("lo") =!= col("hi")).distinct()
    val deg = e.select(col("lo").as("node"))
      .union(e.select(col("hi").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    deg.where(col("deg") >= 2)
      .join(triangleCount(edges), Seq("node"), "left")
      .na.fill(0L, Seq("triangles"))
      .select(col("node"), col("deg"), col("triangles"),
        expr("2 * triangles * 1000000 div (deg * (deg - 1))")
          .as("lcc_ppm"))
      .orderBy("node")
  }

  /** RICH-CLUB TRAJECTORY: for each power-of-two degree cutoff k,
    * the subgraph induced on nodes of degree > k — node count,
    * directed-arc count, and its density φ(k) = arcs·1e6 div
    * (N_k·(N_k−1)) in ppm (Zhou & Mondragón's rich-club
    * coefficient) — a φ that RISES with k means the hubs form a
    * tight club (one hot partition at shuffle time, the natural
    * broadcast set); a falling φ means hubs are mutually distant
    * (salting beats broadcasting). Levels with fewer than two
    * surviving nodes are omitted (φ undefined).
    *
    * Scale shape: one degree count, one arcs⨝degrees equi-join
    * (both endpoints), then the bounded 16-level literal explode on
    * that joined arc table and a per-level count — the arc table is
    * scanned once per plan, never re-shuffled per level. N_k·(N_k−1)
    * stays BIGINT — exact to ~3e9 club members.
    *
    * Output: (k, n_nodes, n_arcs, phi_ppm) ordered by k. */
  def richClub(edges: DataFrame): DataFrame = {
    val arcs = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = arcs.groupBy("src").agg(count(lit(1)).as("deg"))
    val joined = arcs
      .join(deg.select(col("src"), col("deg").as("dx")), Seq("src"))
      .join(deg.select(col("src").as("dst"), col("deg").as("dy")),
        Seq("dst"))
    val perK = joined
      .withColumn("j", explode(expr("sequence(0, 15)")))
      .select(expr("CAST(shiftleft(1, j) AS BIGINT)").as("k"),
        col("src"), col("dst"), col("dx"), col("dy"))
      .where(col("dx") > col("k") && col("dy") > col("k"))
      .groupBy("k")
      .agg(countDistinct("src").as("n_nodes"),
        count(lit(1)).as("n_arcs"))
    perK.where(col("n_nodes") >= 2)
      .select(col("k"), col("n_nodes"), col("n_arcs"),
        expr("n_arcs * 1000000 div (n_nodes * (n_nodes - 1))")
          .as("phi_ppm"))
      .orderBy("k")
  }

  /** ASSOCIATION-STRENGTH EDGES: from a bipartite (basket, item)
    * membership table, the top-k item pairs by the SQUARED cosine
    * association w²·1e6 div (n_a·n_b) — w = shared baskets, n = each
    * item's basket count. Raw co-occurrence counts rank ubiquitous
    * items first; the normalization surfaces pairs that co-occur
    * far above what their popularity predicts (w ≤ min(n_a, n_b), so
    * the ppm is bounded by 1e6 — exactly 1e6 means the pair is
    * inseparable). Squaring keeps the cosine integer — no square
    * root ever runs.
    *
    * Scale shape: x191's co-occurrence envelope (basket-keyed
    * equi-self-join — never item×item), one bounded item-count join
    * back, top-k as a TakeOrdered.
    *
    * Output: (src, dst, w, n_src, n_dst, strength2_ppm) — top k by
    * (strength2_ppm desc, w desc, src, dst). */
  def edgeStrength(pairs: DataFrame, minShared: Long = 2,
                   k: Int = 20): DataFrame = {
    require(minShared >= 1 && k >= 1,
      s"need minShared, k >= 1; got $minShared, $k")
    val it = pairs.select(col("b"), col("i")).distinct()
    val cnt = it.groupBy(col("i").as("node"))
      .agg(count(lit(1)).as("n_node"))
    val edges = it.as("a")
      .join(it.as("c"), col("a.b") === col("c.b")
        && col("a.i") < col("c.i"))
      .groupBy(col("a.i").as("src"), col("c.i").as("dst"))
      .agg(count(lit(1)).as("w")).where(col("w") >= minShared)
    edges
      .join(cnt.select(col("node").as("src"), col("n_node").as("n_src")),
        Seq("src"))
      .join(cnt.select(col("node").as("dst"), col("n_node").as("n_dst")),
        Seq("dst"))
      .select(col("src"), col("dst"), col("w"), col("n_src"),
        col("n_dst"),
        expr("w * w * 1000000 div (n_src * n_dst)").as("strength2_ppm"))
      .orderBy(col("strength2_ppm").desc, col("w").desc, col("src"),
        col("dst"))
      .limit(k)
  }

  /** BOUNDED-PROBE HARMONIC CENTRALITY: for each probe node, the exact
    * count of nodes at shortest-path distance 1, 2 and 3, and the
    * 3-hop harmonic score Σ n_d·(1000 div d) = 1000·n1 + 500·n2 +
    * 333·n3 (integer milli — no float harmonic sum). Harmonic
    * centrality is the textbook reachability-with-decay measure
    * (Boldi & Vigna, "Axioms for Centrality", 2014 — public knowledge)
    * and its 3-hop truncation is what "who sits centrally in the
    * supply web" dashboards actually compute: full-graph BFS per node
    * is O(n·m) and unpayable, while hop-3 already separates hubs from
    * periphery on any small-world graph.
    *
    * Scale shape: the frontier expansion is PROBE-KEYED — each round
    * is one equi-join of the (probe, node) frontier against the arc
    * list plus one anti-join against the visited set, so round d costs
    * |probes| × (nodes within d hops), never the full n² BFS; the
    * probe set is the sampling knob (the x382 hubness-audit
    * discipline). Edges are symmetrized internally ([[kCoreTrajectory]]
    * contract). Rounds are checkpointed with eager release.
    *
    * Output: (node, n1, n2, n3, harmonic_milli), probes with at least
    * one neighbor, ordered by node. */
  def harmonicCentralityBounded(edges: DataFrame,
                                probes: DataFrame): DataFrame = {
    val arcs = CacheRegistry.pin(
      edges.select(col("src"), col("dst"))
        .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    val p0 = probes.select(col("node").as("probe"))
    // visited starts as the probe itself (distance 0, not scored);
    // each round's frontier stays pinned until the joined result
    // materializes (a released local checkpoint cannot recompute)
    var visited = CacheRegistry.checkpoint(
      p0.select(col("probe"), col("probe").as("node")))
    var frontier = visited
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    val counts = (1 to 3).map { d =>
      val next = CacheRegistry.checkpoint(
        frontier.join(arcs, frontier("node") === arcs("src"))
          .select(col("probe"), col("dst").as("node"))
          .distinct()
          .join(visited, Seq("probe", "node"), "left_anti"))
      rounds += next
      val prevVisited = visited
      visited = CacheRegistry.checkpoint(visited.unionByName(next))
      CacheRegistry.release(prevVisited)
      frontier = next
      // rename the key per round: the count frames share p0's lineage,
      // so an acc("probe") === c("probe") join would be ambiguous
      next.groupBy("probe").agg(count(lit(1)).as(s"n$d"))
        .withColumnRenamed("probe", s"probe_$d")
    }
    val out = counts.zipWithIndex
      .foldLeft(p0) { case (acc, (c, i)) =>
        acc.join(c, col("probe") === col(s"probe_${i + 1}"), "left")
          .drop(s"probe_${i + 1}")
      }
      .select(col("probe").as("node"),
        coalesce(col("n1"), lit(0L)).as("n1"),
        coalesce(col("n2"), lit(0L)).as("n2"),
        coalesce(col("n3"), lit(0L)).as("n3"))
      .where(col("n1") > 0)
      .withColumn("harmonic_milli",
        expr("n1 * 1000 + n2 * 500 + n3 * 333"))
      .orderBy("node")
    // pin (not bare cache) so Session.clearAll reclaims it; materialize
    // before releasing the round frontiers it reads from
    val materialized = CacheRegistry.pin(out)
    materialized.count()
    rounds.foreach(CacheRegistry.release)
    CacheRegistry.release(visited)
    CacheRegistry.release(arcs)
    materialized
  }
}
