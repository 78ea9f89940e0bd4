"""Distributed graph analytics over DataFrame edge lists.

Net-new engine surface (the reference — ``/root/reference/
postgresimporter/main.py`` — ships no graph operators): co-occurrence
graphs are the backbone of corpus curation (document-link dedup,
citation clusters, entity graphs), and at 100 TB they must be built
and traversed with bucketed equi-joins, never adjacency matrices.

Design rules carried from the rest of the engine:

- **Edges are a DataFrame** ``(src, dst)`` with ``src < dst``
  (canonical undirected form). Building them from a co-occurrence
  source (items sharing an order/document) is a self-equi-join on the
  container key — the per-container pair blowup is quadratic in
  container size, so ``cooccurrence_edges`` takes a
  ``max_container_size`` cap that drops pathological mega-containers
  before the self-join, the same way dedup caps hot shingles
  (``max_doc_ratio``) and embedding LSH caps hot buckets
  (``max_bucket_ratio``).
- **Triangle counting orients edges by degree** (compact-forward):
  each edge points from the lower-(degree, id) endpoint to the
  higher. Every wedge is then enumerated at its lowest-degree vertex,
  which bounds per-vertex work by O(sqrt(E)) out-degree even on
  power-law graphs — the classic hub-explosion fix.
- **PageRank runs in scaled fixed-point integers** (rank × 10^12 as
  BIGINT). Contributions use integer division — exact, associative,
  and bit-identical across engines and partition orders, so the
  result is reproducible AND differentially testable against a SQL
  oracle. Each iteration is one shuffle (groupBy dst) + one broadcast
  join of the degree table; ``localCheckpoint`` per iteration stops
  lineage growth (BUILD_NOTES invariant 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spread, explode_ordered_pairs

RANK_SCALE = 10**12  # fixed-point scale for PageRank ranks


def cooccurrence_edges(
    items: DataFrame,
    container_col: str,
    item_col: str,
    max_container_size: int | None = None,
    count_pairs: bool = False,
) -> DataFrame:
    """Distinct undirected co-occurrence edges ``(src < dst)`` from a
    (container, item) relation.

    Rows whose container key is NULL are EXCLUDED in both paths (a
    NULL container is not a container: two rows with NULL keys are
    not known to share anything, the same semantics the uncapped
    path's equi-join always had). The exclusion is an explicit
    pushdown-friendly filter, pinned by test — before r11 the capped
    path's behavior at null keys was an undocumented join side effect
    (ADVICE r10).

    With ``max_container_size`` set (the recommended mode): over-cap
    containers are dropped BEFORE anything collects — the collect_set
    buffer is a single unspillable agg state, and filtering after
    collecting bounds the O(n²) pair array but not the memory that
    builds it (a 40M-item mega-hub container OOM'd a 5g heap when the
    cap was applied after the collect; pre-filtered, the same input
    completes). The gate is two-stage so hub safety costs ~nothing on
    hub-free inputs (r11; the always-on count_distinct + sort-merge
    join gate cost the graph tier ~2.2x at sf1):

    1. raw row count per container (map-side partials, tiny shuffle);
       containers at <= cap raw rows are provably under the distinct
       cap. A driver-side count of the suspect set (metadata-scale)
       then picks the plan: ZERO suspects — the common hub-free case —
       skips both gate joins entirely, leaving the single-shuffle
       collect plus one cheap aggregate;
    2. otherwise, distinct-count ONLY the suspects (raw > cap —
       duplicates may still put them under the distinct cap; the
       crawl re-post corpus where MOST containers are raw-suspect but
       none are true hubs is NORMAL input and must not degrade),
       keeping the drop rule identical to the old gate: DISTINCT item
       count > cap;
    3. the true-hub drop set feeds one anti-join, broadcast by hint
       only when its driver-counted size is known small — an
       unexpectedly huge suspect or hub set falls back to unhinted
       joins (AQE decides), so no corpus shape can force an unbounded
       driver broadcast; survivor buffers stay <= cap distinct
       elements by construction either way.

    Survivors collect in one groupBy (collect_set dedups in the agg,
    so no pre-distinct pass) and the pairwise expansion happens
    executor-side over the per-container sorted array — no self-join
    over the items. Measured at sf0.1 this beats the
    distinct→self-join→distinct layout with identical output.

    Without a cap, the operator falls back to the container-key
    self-equi-join: the same pairs emerge as ordinary join-output ROWS
    that spill through the shuffle, so an unknown-skew input degrades
    to slow instead of OOM/array-limit (a ~70k-item container would
    exceed the 2^31 array-element ceiling in the array path).

    ``count_pairs=True`` returns (src, dst, n_shared) — the number of
    containers sharing the pair (co-purchase strength, the item2item
    recommendation weight) — via the same single-shuffle layout, with
    the final distinct replaced by a count aggregate.
    """
    keyed = items.select(
        F.col(container_col).alias("_c"), F.col(item_col).alias("src")
    ).where(F.col("_c").isNotNull())
    if max_container_size is None:
        # distinct is needed here (the join would pair duplicate item
        # rows); checkpoint it — both join sides read it
        a = keyed.distinct().localCheckpoint(eager=False)
        b = a.select("_c", F.col("src").alias("dst"))
        joined = (
            a.join(b, on="_c")
            .where(F.col("src") < F.col("dst"))
            .select("src", "dst")
        )
        if count_pairs:
            return joined.groupBy("src", "dst").agg(
                F.count("*").cast("long").alias("n_shared")
            )
        return joined.distinct()
    # Two-stage hub gate (see docstring). No checkpoint of the full
    # input: every branch is a deterministic projection of the same
    # scan, and materializing the whole (container, item) relation
    # cost more than the reads it saved (r11 A/B: 5.7s -> 2.6s at
    # sf1 with identical output). DETERMINISM ASSUMPTION (ADVICE r11,
    # mirrors the interval join's level collect): the suspect count,
    # the distinct-count gate, and the final collect each re-evaluate
    # `items`, so a NON-deterministic input (sample()/limit()/RDD
    # shuffle-dependent source) could show a true mega-hub to the
    # collect scan that the gate evaluation never saw, rebuilding the
    # unspillable collect_set buffer the cap exists to prevent —
    # callers with such inputs must cache()/localCheckpoint() `items`
    # BEFORE calling, exactly as interval_join documents for its
    # intervals side.
    suspects = (
        keyed.groupBy("_c")
        .agg(F.count("*").alias("_nr"))
        .where(F.col("_nr") > max_container_size)
        .select("_c")
    )
    # Driver-side adaptive gate (metadata-scale count, the bloom-
    # parameter-collect class): a duplicate-heavy corpus — the crawl
    # re-post shape, NORMAL input per the r10 program — can put MOST
    # containers over the cap in RAW rows while few (or none) exceed
    # it in DISTINCT items, so a static broadcast hint on `suspects`
    # would force an unbounded driver build exactly when the input is
    # ordinary. Count it first: zero suspects skips both gate joins
    # entirely (the dominant hub-free case pays ONE cheap aggregate
    # over the single-shuffle collect); a small set broadcasts by
    # hint; a large set falls back to unhinted joins (AQE decides) —
    # never an unbounded forced broadcast.
    _BCAST_KEYS = 2_000_000  # ~key bytes only; tens of MB at worst
    # eager checkpoint: O(suspects) rows (pigeonhole: <= rows/cap), so
    # the count action and the gate join share ONE evaluation of the
    # raw-count aggregate instead of scanning the input twice
    suspects = suspects.localCheckpoint(eager=True)
    n_susp = suspects.count()
    if n_susp == 0:
        sets = keyed.groupBy("_c").agg(
            F.sort_array(F.collect_set("src")).alias("_items")
        )
    else:
        susp = F.broadcast(suspects) if n_susp <= _BCAST_KEYS else suspects
        over_cap = (
            keyed.join(susp, on="_c")
            .groupBy("_c")
            .agg(F.count_distinct("src").alias("_n"))
            .where(F.col("_n") > max_container_size)
            .select("_c")
        )
        # over_cap <= suspects rows; when suspects was too big to
        # broadcast, materialize over_cap (it is the TRUE hub set,
        # small on any sane corpus) and re-check before hinting.
        if n_susp <= _BCAST_KEYS:
            drop = F.broadcast(over_cap)
        else:
            over_cap = over_cap.localCheckpoint(eager=True)
            drop = (
                F.broadcast(over_cap)
                if over_cap.count() <= _BCAST_KEYS
                else over_cap
            )
        sets = (
            keyed.join(drop, on="_c", how="left_anti")
            .groupBy("_c")
            .agg(F.sort_array(F.collect_set("src")).alias("_items"))
        )
    pairs = explode_ordered_pairs(sets, "_items", "src", "dst")
    if count_pairs:
        return pairs.groupBy("src", "dst").agg(
            F.count("*").cast("long").alias("n_shared")
        )
    return pairs.distinct()


def degrees(edges: DataFrame) -> DataFrame:
    """Per-node degree of a canonical undirected edge list: explode
    each edge to both endpoints, one exact groupBy (map-side partial).
    """
    ends = edges.select(F.col("src").alias("node")).unionAll(
        edges.select(F.col("dst").alias("node"))
    )
    return ends.groupBy("node").agg(F.count("*").cast("long").alias("degree"))


def oriented_edges(edges: DataFrame) -> DataFrame:
    """Orient canonical edges from the lower-(degree, id) endpoint to
    the higher (compact-forward orientation). The degree table is O(V)
    — smaller than edges but NOT guaranteed broadcast-safe at corpus
    scale (a web graph's V exceeds the executor broadcast limit), so
    no broadcast hint: AQE picks broadcast at runtime when the degree
    table fits, shuffle-hash otherwise. The degree table feeds both
    endpoint joins — checkpoint it once so the second join doesn't
    re-run the upstream edge build.
    """
    deg = degrees(edges).localCheckpoint(eager=False)
    e = (
        edges.join(
            deg.withColumnRenamed("node", "src").withColumnRenamed("degree", "dsrc"),
            on="src",
        )
        .join(
            deg.withColumnRenamed("node", "dst").withColumnRenamed("degree", "ddst"),
            on="dst",
        )
    )
    keep = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    fwd = e.where(keep).select(F.col("src").alias("u"), F.col("dst").alias("v"))
    rev = e.where(~keep).select(
        F.col("dst").alias("u"), F.col("src").alias("v")
    )
    return fwd.unionAll(rev)


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """Exact per-node triangle participation counts.

    Wedges are enumerated at the lowest-degree vertex of each
    triangle (compact-forward), then closed with one equi-join back
    to the oriented edge list; each triangle is found exactly once
    and credited to all three corners via an explode + groupBy.
    Work is O(Σ d_out²) with d_out ≤ O(sqrt(E)) — the hub-safe bound.
    """
    o = oriented_edges(edges).localCheckpoint(eager=False)
    w1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    w2 = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = w1.join(w2, on="a").where(F.col("b") < F.col("c"))
    closed = wedges.join(
        o.select(
            F.least("u", "v").alias("b"), F.greatest("u", "v").alias("c")
        ).distinct(),
        on=["b", "c"],
    )
    corners = closed.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count("*").cast("long").alias("n_triangles")
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    weight_col: str | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank on an undirected canonical edge list,
    in exact fixed-point arithmetic (rank × 10^12 stored as BIGINT).

    Per iteration: contribution = rank div degree (integer division —
    exact and engine-portable), one shuffle to sum contributions per
    destination, then ``rank' = (1-d)·S div N + d·Σcontrib div 100``.
    Dangling nodes cannot occur on an undirected graph (degree ≥ 1).
    Iteration layout: the per-node state (node, degree, rank) is
    rebuilt each round with an O(V)⋈O(V) join (deg ⋈ new ranks) and
    the edge table stays NARROW (src, dst[, w]); each iteration makes
    one pass over the O(E) table against the small state. The
    alternative — folding degree into the edge table once before the
    loop — was benched head-to-head at sf1 on the q119 co-purchase
    graph (3 iterations, min-of-3, local[32]): folded-edge 7.10s vs
    state-rebuild 6.11s, identical results. The folded layout
    checkpoints an 8-byte-wider O(E) table up front and carries it
    through every iteration's join, which costs more than the three
    O(V) state-rebuild joins it saves; it also regressed the round-4
    external bench 47% (7.08s → 10.41s), so the state-rebuild layout
    is pinned here. State is joined without a broadcast hint so AQE
    broadcasts it only when it actually fits (a web-scale V can
    exceed the broadcast cap). ``localCheckpoint`` caps lineage
    (invariant 6); at 1000 executors this is the standard
    Pregel-as-joins layout.

    With ``weight_col`` set, edges carry an integer weight (e.g. the
    co-purchase strength ``n_shared``): the out-"degree" becomes the
    node's total strength and each contribution is
    ``(rank · w) div strength`` — still exact integer arithmetic
    (rank ≤ 10^12 and integer weights keep the product inside
    signed-64 for weights up to ~9·10^6).

    Returns (node, rank_scaled BIGINT, rank DOUBLE); empty edges give
    an empty result rather than a division-by-zero.
    """
    # checkpoint the EDGE table first: both union branches and the
    # degree aggregation read it, and without this the upstream edge
    # build (a co-occurrence self-join in the q119 caller) would run
    # once per consumer instead of once total
    w_cols = [weight_col] if weight_col else []
    e = edges.select("src", "dst", *w_cols).localCheckpoint(eager=False)
    sym = e.unionAll(
        e.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), *w_cols
        )
    )
    deg_agg = (
        F.sum(weight_col) if weight_col else F.count("*")
    )
    deg = (
        sym.groupBy("src")
        .agg(deg_agg.cast("long").alias("degree"))
        .withColumnRenamed("src", "node")
        .localCheckpoint(eager=False)
    )
    n_nodes = deg.count()  # driver scalar: O(V) metadata-scale, like reconcile counts
    if n_nodes == 0:
        return deg.select(
            "node",
            F.lit(0).cast("long").alias("rank_scaled"),
            F.lit(0.0).alias("rank"),
        )
    base = ((100 - damping_pct) * RANK_SCALE) // (100 * n_nodes)
    init = RANK_SCALE // n_nodes
    # keep the O(E) table narrow; degree rides in the O(V) state and
    # is re-joined after each round (measured faster than folding it
    # into the edges — see the layout note in the docstring)
    sym = sym.localCheckpoint(eager=False)
    contrib_expr = (
        f"(rank_scaled * {weight_col}) div degree"
        if weight_col
        else "rank_scaled div degree"
    )
    state = deg.select(
        "node", "degree", F.lit(init).cast("long").alias("rank_scaled")
    )
    for _ in range(iterations):
        contrib = sym.join(
            state.withColumnRenamed("node", "src"), on="src"
        ).select(
            F.col("dst").alias("node"),
            F.expr(contrib_expr).alias("c"),
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("sc"))
        ranks = summed.select(
            "node",
            (
                F.lit(base)
                + F.expr(f"(sc * {damping_pct}) div 100")
            ).cast("long").alias("rank_scaled"),
        )
        # No per-round checkpoint (r13): state appears exactly ONCE in
        # the next round's lineage, so the final action's plan grows
        # linearly in iterations (invariant 6's re-run disease needs a
        # per-round ACTION or a branching state reference — neither
        # exists here; deg/sym, read by every round, stay checkpointed
        # per its r3 corollary). Keeping the rounds in one visible plan
        # lets AQE pick join strategies per stage and skips 1 RDD
        # materialization per round — measured 6.85s -> 6.39s (sf1
        # co-purchase, 3 iterations, min-of-2, same session).
        state = deg.join(ranks, on="node")
    ranks = state.select("node", "rank_scaled")
    return ranks.select(
        "node",
        "rank_scaled",
        (F.col("rank_scaled").cast("double") / F.lit(float(RANK_SCALE))).alias(
            "rank"
        ),
    )


def degree_histogram(edges: DataFrame) -> DataFrame:
    """Degree distribution: (degree, n_nodes) — two exact groupBys."""
    return (
        degrees(edges)
        .groupBy("degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
    )


def label_propagation(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Synchronous label-propagation community detection (Raghavan,
    Albert & Kumara 2007): every node starts in its own community
    (label = node id) and repeatedly adopts the MAJORITY label among
    its neighbors, ties broken to the SMALLEST label — the
    deterministic synchronous variant, so the result is reproducible
    across engines, partitionings, and runs (the async/random variant
    in the paper is not).

    Complements ``components.py`` (min-label propagation finds
    CONNECTED components; this finds densely-linked communities inside
    them) and shares the graph tier's Pregel-as-joins layout: per
    iteration one O(E) join of the edge list against the O(V) label
    table, a (node, label) vote count, and a deterministic argmax —
    expressed as ``min(struct(-cnt, label))`` so it stays a hash
    aggregate (no per-node window) and works for any orderable node
    type. ``localCheckpoint`` per round caps
    lineage (invariant 6).

    Returns (node, label) after ``iterations`` synchronous rounds.
    """
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    # labels keep the node's NATIVE type (string word graphs, long item
    # graphs alike): the earlier cast('long') silently nulled every
    # label on non-numeric ids. The argmax is min(struct(-cnt, label)):
    # smallest -cnt = largest vote, then smallest label — orderable for
    # any comparable label type, still a hash aggregate.
    labels = sym.select("src").distinct().select(
        F.col("src").alias("node"), F.col("src").alias("label")
    )
    for _ in range(iterations):
        # the node's own current label votes too: pure neighbor voting
        # oscillates on bipartite-ish structures (the classic
        # synchronous-LPA 2-coloring flip on paths/stars); the
        # self-vote is the standard damping that keeps the update a
        # deterministic hash aggregate
        msgs = sym.join(
            labels, sym["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "label").unionAll(
            labels.select("node", "label")
        )
        votes = msgs.groupBy("node", "label").agg(
            F.count("*").alias("cnt")
        )
        labels = (
            votes.groupBy("node")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("cnt")).alias("nc"),
                        F.col("label").alias("l"),
                    )
                ).alias("m")
            )
            .select("node", F.col("m.l").alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels


def kcore(edges: DataFrame, k: int, rounds: int = 3) -> DataFrame:
    """Fixed-round k-core peeling over a canonical undirected edge
    list: each round drops every node of degree < ``k`` and the edges
    touching it, the standard iterative decomposition (Seidman 1983)
    with a BOUNDED round count so the operator is deterministic and
    oracle-replayable regardless of convergence (the same fixed-point
    discipline as ``pagerank``; run more rounds for a converged core).

    Each round costs one degree aggregation (O(E), map-side partials)
    plus two semi-joins of the edge list against the O(V) survivor
    set — no broadcast hint, AQE broadcasts survivors when they fit.
    ``localCheckpoint`` per round caps lineage (invariant 6).

    Returns (node, degree) of the nodes surviving all rounds, with
    their degree in the FINAL peeled subgraph.
    """
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    for _ in range(rounds):
        # keep is NOT checkpointed (r14): both endpoint filters are
        # LEFT SEMI joins against the SAME unrenamed subtree, so its
        # exchange canonicalizes identically and Spark computes the
        # degree aggregate once and reuses it (the old per-round
        # checkpoint achieved the same single computation by
        # materializing it — but under AQE every checkpoint runs its
        # subtree at build time as serialized micro-jobs, and two
        # checkpoints per round made that fixed cost dominate the
        # local q180 reading: ~5s of driver-serialized dispatch over
        # ~0.2s of warm data work). Semi join == inner join here
        # (keep's node is unique, a groupBy output) and keeps only
        # e's columns, exactly like the renamed-inner-join layout.
        keep = degrees(e).where(F.col("degree") >= k).select("node")
        e = (
            e.join(keep, e["src"] == keep["node"], "left_semi")
            .join(keep, e["dst"] == keep["node"], "left_semi")
            .localCheckpoint(eager=False)
        )
    return degrees(e)


def pointer_jump_roots(
    parents: DataFrame,
    rounds: int,
    node_col: str = "node",
    parent_col: str = "parent",
) -> DataFrame:
    """Root + depth for every node of a FUNCTIONAL forest (each node
    has one parent; roots point at themselves) via pointer jumping /
    path doubling: each round replaces every node's ancestor pointer
    with its ancestor's ancestor and adds the distances, so the
    reachable depth doubles per round — ``rounds`` = ceil(log2(max
    chain depth)) O(V)⋈O(V) self-joins instead of max-depth
    sequential steps. The classic shape for redirect-chain /
    symlink / alias resolution at corpus scale (a 10^6-deep chain
    resolves in 20 rounds). Roots keep distance 0 and self-pointers,
    so converged state is a fixpoint and extra rounds are harmless.

    Returns (node, root, depth). Nodes whose chain exceeds
    2^rounds resolve to their 2^rounds-th ancestor with that partial
    depth — callers pick ``rounds`` from a known depth bound (or
    iterate until a fixpoint check passes).
    """
    state = parents.select(
        F.col(node_col).alias("node"),
        F.col(parent_col).alias("anc"),
        F.when(F.col(parent_col) == F.col(node_col), F.lit(0))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("depth"),
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        a, b = state.alias("a"), state.alias("b")
        state = (
            a.join(b, F.col("a.anc") == F.col("b.node"))
            .select(
                F.col("a.node").alias("node"),
                F.col("b.anc").alias("anc"),
                (F.col("a.depth") + F.col("b.depth")).alias("depth"),
            )
            .localCheckpoint(eager=False)
        )
    return state.select("node", F.col("anc").alias("root"), "depth")


# Salt count for the two-phase per-node neighbor cap: stage 1 keeps a
# bounded top-k per (node, salt) slice, stage 2 merges <=_CAP_SALTS
# bounded arrays — no agg buffer ever holds more than max(degree /
# _CAP_SALTS, _CAP_SALTS * max_degree) entries, so a 10^7-degree crawl
# hub never materializes as one row anywhere in the capping plan.
_CAP_SALTS = 32


def _capped_adjacency(sym: DataFrame, max_degree: int, seed: str) -> DataFrame:
    """Per-node neighbor arrays of the symmetric edge list, capped to
    the ``max_degree`` neighbors minimizing ``md5(seed:node:neighbor)``
    — a deterministic hash-top-k sample, the same
    hash-order-never-RNG-state discipline as every sampler in this
    repo, so a capped walk is reproducible across engines, retries,
    and repartitions. Exact top-k in two bounded phases (salted
    partial top-k, then merge-of-k-lists), never a per-node window
    sort that would put an entire hub key in one task."""
    score = F.md5(
        F.concat_ws(":", F.lit(seed), F.col("src"), F.col("dst"))
    )
    part = (
        sym.select(
            "src",
            F.pmod(F.xxhash64("dst"), F.lit(_CAP_SALTS)).alias("_salt"),
            F.struct(score.alias("s"), F.col("dst").alias("d")).alias("_sd"),
        )
        .groupBy("src", "_salt")
        .agg(
            F.slice(
                F.array_sort(F.collect_list("_sd")), 1, max_degree
            ).alias("_arr")
        )
    )
    return (
        part.groupBy("src")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("_arr"))),
                1,
                max_degree,
            ).alias("_arr")
        )
        .select(
            "src", F.transform("_arr", lambda x: x["d"]).alias("_nbrs")
        )
    )


def hot_degrees(edges: DataFrame, max_degree: int) -> DataFrame:
    """The nodes a ``random_walks(..., max_degree=...)`` run with the
    same cap would truncate, as (node, degree, kept, dropped) rows —
    the no-silent-caps audit for the walk sampler: a capped walk run
    should count/log these next to its walk output, exactly as
    ``hot_shingles``/``hot_bands`` audit the Jaccard and SimHash caps.
    Degrees are of the SYMMETRIC (undirected) edge list, matching what
    the walker traverses."""
    e = edges.select("src", "dst")
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").cast("long").alias("degree"))
        .where(F.col("degree") > max_degree)
        .select(
            "node",
            "degree",
            F.lit(max_degree).cast("long").alias("kept"),
            (F.col("degree") - max_degree).alias("dropped"),
        )
    )


def random_walks(
    edges: DataFrame,
    length: int = 4,
    seed: str = "walk",
    max_degree: int | None = None,
) -> DataFrame:
    """Deterministic hash-seeded uniform random walks over an
    undirected canonical edge list — the node2vec/DeepWalk sampling
    stage that feeds graph-embedding training. One walk starts at
    every node; at step t the walker moves to the neighbor minimizing
    md5(seed:walk:t:neighbor) — "random" to the graph but a pure
    function of (seed, walk, step), so walks are reproducible across
    engines, retries, and repartitions (the same discipline as every
    deterministic sampler in this repo: hash order, never RNG state).

    The adjacency list is materialized ONCE (per-node neighbor array,
    checkpointed); each step is then one V-row equi-join (state ⋈
    adjacency on the current node) with the argmin computed by ONE
    md5 per neighbor (transform) + an in-row struct array_min — no
    per-step edge shuffle, no per-step groupBy. Measured at sf0.1 on
    the co-purchase graph (4 steps, min-of-3): 11.6s for the
    frontier⋈edges + groupBy layout vs 4.9s for this one, identical
    walks. Contract: per-node degree must fit one row — the usual
    power-law graphs are fine; for truly unbounded hub degrees pass
    ``max_degree``, which caps every node's adjacency to the
    ``max_degree`` neighbors minimizing ``md5(seed:node:neighbor)``
    (deterministic hash-top-k, built in bounded two-phase aggregates
    so the hub never materializes as one row even transiently) and is
    audited by ``hot_degrees(edges, max_degree)`` — the explicit,
    reported cap; nothing is ever dropped silently here. Walkers can
    never dead-end on an undirected graph (the back-edge always
    exists; a hash-top-k capped adjacency is non-empty for every node
    that had any neighbor). Returns (walk_id, step, node) rows,
    step 0 = the start node.
    """
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    sym = e.unionAll(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if max_degree is not None:
        adj = _capped_adjacency(sym, max_degree, seed).localCheckpoint(
            eager=False
        )
    else:
        adj = (
            sym.groupBy("src")
            .agg(F.collect_list("dst").alias("_nbrs"))
            .localCheckpoint(eager=False)
        )
    # _spread (r14): the per-step argmin scoring — one md5 per
    # neighbor, interpreted HOF eval, by far the walk's CPU (92s
    # executor time on the 14MB sf0.1 graph) — pipelines over the
    # STATE side of every step's broadcast join, so state's partition
    # count IS the scoring parallelism for all ``length`` steps. The
    # groupBy-built state arrives AQE-coalesced to a handful of
    # partitions; state rows are two longs, so the widening exchange
    # is ~16 bytes/node once while every step's scoring gains the full
    # session width (sf0.1 q298 4.58 -> 3.89s min-of-3 interleaved,
    # picks bit-identical).
    state = _spread(
        adj.select(
            F.col("src").alias("walk_id"), F.col("src").alias("cur")
        )
    ).localCheckpoint(eager=False)
    out = state.select(
        "walk_id", F.lit(0).cast("long").alias("step"),
        F.col("cur").alias("node"),
    )
    for t in range(1, length + 1):
        # score = the raw 15-hex-char md5 prefix, compared as a STRING
        # (r13): fixed-width lowercase hex orders identically to its
        # numeric value ('0'-'9' < 'a'-'f' matches digit order), so the
        # argmin neighbor — the only thing that leaves this expression
        # — is unchanged while the per-neighbor base-16 conv() parse
        # (the most expensive piece of the old scorer: sf0.1 walk phase
        # 3.86s -> 3.44s min-of-3) disappears. Same trick
        # _capped_adjacency has always used.
        def _score(d):
            return F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(seed), F.col("walk_id"), F.lit(t), d
                    )
                ),
                1,
                15,
            )

        # hash each neighbor exactly ONCE (transform), then take the
        # lexicographic struct min — an md5 inside the fold comparator
        # would re-hash per comparison (the simhash lesson: ~8x)
        pick = F.array_min(
            F.transform(
                F.col("_nbrs"),
                lambda d: F.struct(_score(d).alias("s"), d.alias("d")),
            )
        )
        state = (
            state.join(adj, state["cur"] == adj["src"])
            .select("walk_id", pick["d"].alias("cur"))
            .localCheckpoint(eager=False)
        )
        out = out.unionAll(
            state.select(
                "walk_id",
                F.lit(t).cast("long").alias("step"),
                F.col("cur").alias("node"),
            )
        )
    return out


def bellman_ford(
    edges: DataFrame,
    source: DataFrame,
    rounds: int,
    weight_col: str = "w",
) -> DataFrame:
    """Single-source shortest paths over an undirected WEIGHTED edge
    list by ``rounds`` Bellman-Ford relaxations — the weighted cousin
    of the BFS/Pregel join shape used everywhere in this module: each
    round is ONE equi-join of the tentative-distance frontier with the
    symmetric edge list plus a min-groupBy, so the plan is R bounded
    shuffles regardless of graph size (R >= the hop diameter of the
    reachable region gives exact distances; fewer rounds give the
    standard partial relaxation). Weights are integers and all
    arithmetic stays in BIGINT — bit-identical across engines, so a
    chained-CTE SQL oracle replays it exactly.

    ``source`` is a 1-row (node) DataFrame — engine-pure, no driver
    collect in plan construction. Returns (node, dist) for every node
    reached within ``rounds`` relaxations."""
    sym = edges.select("src", "dst", weight_col).unionAll(
        edges.select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            weight_col,
        )
    ).localCheckpoint(eager=False)
    state = source.select(
        F.col(source.columns[0]).alias("node"),
        F.lit(0).cast("long").alias("dist"),
    ).localCheckpoint(eager=False)
    for _ in range(rounds):
        relaxed = state.join(
            sym, state["node"] == sym["src"]
        ).select(
            F.col("dst").alias("node"),
            (F.col("dist") + F.col(weight_col)).cast("long").alias("dist"),
        )
        state = (
            state.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=False)
        )
    return state


def edge_support(edges: DataFrame) -> DataFrame:
    """Per-edge triangle support of a canonical undirected edge list:
    (src, dst, support) where support = number of triangles containing
    the edge. Triangles are enumerated ONCE each at their lowest-
    degree corner (compact-forward orientation, same hub-safe
    O(sqrt(E)) wedge bound as ``triangles_per_node``) and credited to
    their three edges with an explode + one exact groupBy. Edges in no
    triangle are absent from the result (support would be 0)."""
    o = oriented_edges(edges).localCheckpoint(eager=False)
    w1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"))
    w2 = o.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = w1.join(w2, on="a").where(F.col("b") < F.col("c"))
    closed = wedges.join(
        o.select(
            F.least("u", "v").alias("b"), F.greatest("u", "v").alias("c")
        ).distinct(),
        on=["b", "c"],
    )
    tri_edges = closed.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("src"),
                    F.greatest("a", "b").alias("dst"),
                ),
                F.struct(
                    F.least("a", "c").alias("src"),
                    F.greatest("a", "c").alias("dst"),
                ),
                F.struct(F.col("b").alias("src"), F.col("c").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return tri_edges.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("support")
    )


def ktruss_edges(edges: DataFrame, k: int, rounds: int) -> DataFrame:
    """``rounds`` peeling iterations toward the k-truss (Cohen 2008;
    every surviving edge sits in >= k-2 triangles OF THE SURVIVING
    subgraph): each round recomputes edge supports on the current edge
    set and drops edges under k-2. Bounded rounds, same discipline as
    ``pointer_jump_roots`` — callers pick ``rounds`` from a known
    peel-depth bound or iterate to a fixpoint check; each round is one
    hub-safe triangle enumeration (O(sqrt(E)) wedge work) plus one
    filter, all equi-joins. Returns the last round's surviving edges
    with their support AS MEASURED ON THE PREVIOUS round's edge set
    (the quantity the final filter used)."""
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    supp = None
    for _ in range(rounds):
        supp = edge_support(e).where(
            F.col("support") >= k - 2
        ).localCheckpoint(eager=False)
        e = supp.select("src", "dst")
    return supp if supp is not None else edge_support(e)
