"""Graph operators: known-answer micro-fixtures (degrees, triangles,
PageRank conservation) independent of the DuckDB differential gate."""

from __future__ import annotations

from postgresimporter_spark.operators.graph import (
    RANK_SCALE,
    cooccurrence_edges,
    degrees,
    pagerank,
    triangles_per_node,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def test_cooccurrence_edges_canonical(spark):
    items = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 20), (1, 30), (2, 20), (2, 10)],
        ["container", "item"],
    )
    got = {
        (r.src, r.dst)
        for r in cooccurrence_edges(items, "container", "item").collect()
    }
    # duplicates collapse; all edges canonical src < dst
    assert got == {(10, 20), (10, 30), (20, 30)}


def test_cooccurrence_max_container_size(spark):
    # one normal basket (2 items -> 1 pair) + one mega-basket (20 items
    # -> 190 pairs). cap=10 must drop the mega-basket entirely: the
    # candidate count stays sub-quadratic under skew.
    rows = [(1, 10), (1, 20)] + [(2, i) for i in range(100, 120)]
    items = spark.createDataFrame(rows, ["container", "item"])
    capped = cooccurrence_edges(
        items, "container", "item", max_container_size=10
    )
    assert {(r.src, r.dst) for r in capped.collect()} == {(10, 20)}
    # uncapped sanity: the mega-basket would have contributed C(20,2)
    uncapped = cooccurrence_edges(items, "container", "item")
    assert uncapped.count() == 1 + 190


def test_pagerank_empty_edges(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out = pagerank(empty, iterations=3)
    assert out.columns == ["node", "rank_scaled", "rank"]
    assert out.count() == 0


def test_triangles_known_graph(spark):
    # K4 on {1,2,3,4} plus a pendant 5--1: C(4,3)=4 triangles, each K4
    # vertex in 3 of them, pendant in none.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    tri = {
        r.node: r.n_triangles
        for r in triangles_per_node(_edges(spark, k4 + [(1, 5)])).collect()
    }
    assert tri == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_free_graph(spark):
    # 4-cycle: no triangles at all
    c4 = [(1, 2), (2, 3), (3, 4), (1, 4)]
    assert triangles_per_node(_edges(spark, c4)).count() == 0


def test_pagerank_uniform_on_regular_graph(spark):
    # On a regular graph (triangle), PageRank is exactly uniform at
    # every iteration: rank stays 1/3 (up to fixed-point floor).
    tri = [(1, 2), (2, 3), (1, 3)]
    rows = pagerank(_edges(spark, tri), iterations=4).collect()
    assert len(rows) == 3
    expected = RANK_SCALE // 3
    for r in rows:
        # base + damped contribution reconstructs ~1/3 exactly in
        # integer arithmetic: (0.15/3 + 0.85*(1/3)) * S, floored
        assert abs(r.rank_scaled - expected) <= 2
        assert abs(r.rank - 1 / 3) < 1e-9


def test_pagerank_mass_approximately_conserved(spark):
    # star graph 1--{2,3,4}: total mass stays ~1 (floor drift < 1e-9
    # per node per iteration at scale 10^12)
    star = [(1, 2), (1, 3), (1, 4)]
    rows = pagerank(_edges(spark, star), iterations=3).collect()
    total = sum(r.rank for r in rows)
    assert abs(total - 1.0) < 1e-6
    ranks = {r.node: r.rank for r in rows}
    # hub strictly outranks leaves; leaves identical by symmetry
    assert ranks[1] > ranks[2]
    assert ranks[2] == ranks[3] == ranks[4]


def test_degrees(spark):
    deg = {
        r.node: r.degree
        for r in degrees(_edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])).collect()
    }
    assert deg == {1: 2, 2: 2, 3: 3, 4: 1}


def test_label_propagation_two_cliques(spark):
    from postgresimporter_spark.operators.graph import label_propagation

    # two triangles joined by one bridge edge: after 3 synchronous
    # majority rounds each triangle converges to its own min label
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    bridge = [(3, 4)]
    edges = spark.createDataFrame(tri1 + tri2 + bridge, ["src", "dst"])
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert labels[1] == labels[2] == labels[3]
    assert labels[4] == labels[5] == labels[6]
    assert labels[1] != labels[4]


def test_label_propagation_tie_breaks_to_smallest(spark):
    from postgresimporter_spark.operators.graph import label_propagation

    # node 2's neighbors 1 and 3 tie (one vote each): label 1 wins
    edges = spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"])
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=1).collect()
    }
    assert labels[2] == 1


def test_label_propagation_string_nodes(spark):
    from postgresimporter_spark.operators.graph import label_propagation

    # string ids must keep their native labels (a cast-to-long here
    # once nulled every label silently)
    edges = spark.createDataFrame(
        [("apple", "avocado"), ("avocado", "apricot"),
         ("banana", "blueberry")],
        ["src", "dst"],
    )
    labels = {
        r["node"]: r["label"]
        for r in label_propagation(edges, iterations=3).collect()
    }
    assert None not in labels.values()
    assert labels["apple"] == labels["avocado"] == labels["apricot"]
    assert labels["banana"] == labels["blueberry"]
    assert labels["apple"] != labels["banana"]


def test_random_walks_max_degree_cap_hub(spark):
    """A hub node (degree 40 ≫ cap) walks correctly under the explicit
    hash-top-k adjacency cap: the capped run matches a sequential
    Python model that caps adjacency by md5(seed:node:neighbor) order
    first, a cap wider than every degree is a no-op (identical walks
    to the uncapped run), and hot_degrees names exactly the truncated
    hub with its kept/dropped split."""
    import hashlib

    from postgresimporter_spark.operators.graph import (
        hot_degrees,
        random_walks,
    )

    pairs = [(0, i) for i in range(1, 41)] + [(i, i + 1) for i in range(1, 8)]
    df = _edges(spark, [(int(a), int(b)) for a, b in pairs])

    uncapped = {
        (r.walk_id, r.step, r.node)
        for r in random_walks(df, length=3).collect()
    }
    wide = {
        (r.walk_id, r.step, r.node)
        for r in random_walks(df, length=3, max_degree=100).collect()
    }
    assert wide == uncapped

    adj: dict[int, set[int]] = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)

    def cap_key(node, nbr):
        return (hashlib.md5(f"walk:{node}:{nbr}".encode()).hexdigest(), nbr)

    capped_adj = {
        n: set(sorted(nbrs, key=lambda d: cap_key(n, d))[:5])
        for n, nbrs in adj.items()
    }

    def step_score(wid, t, dst):
        h = hashlib.md5(f"walk:{wid}:{t}:{dst}".encode()).hexdigest()
        return int(h[:15], 16)

    want = set()
    for start in capped_adj:
        cur = start
        want.add((start, 0, start))
        for t in range(1, 4):
            cur = min(
                capped_adj[cur], key=lambda d: (step_score(start, t, d), d)
            )
            want.add((start, t, cur))
    got = {
        (r.walk_id, r.step, r.node)
        for r in random_walks(df, length=3, max_degree=5).collect()
    }
    assert got == want

    hot = {
        r.node: (r.degree, r.kept, r.dropped)
        for r in hot_degrees(df, 5).collect()
    }
    assert hot == {0: (40, 5, 35)}


def test_cooccurrence_cap_prefilter_semantics(spark):
    """The r10 mega-hub fix pre-filters containers by COUNT DISTINCT
    before any collect_set buffer builds (a 40M-item container OOM'd a
    5g heap post-filter; pre-filtered it completes). The cap must
    still count DISTINCT items — a container with many duplicate rows
    but few distinct items survives — and over-cap containers drop
    with identical output to the uncapped join path on the survivors.
    """
    from postgresimporter_spark.operators.graph import cooccurrence_edges

    rows = []
    # 200 rows, 4 distinct items (duplicates must not trip the cap)
    for i in range(200):
        rows.append(("dupes", f"i{i % 4}"))
    # over-cap container: 12 distinct items, cap 8 -> dropped
    rows += [("big", f"b{i}") for i in range(12)]
    # normal container
    rows += [("ok", x) for x in ["a", "b", "c"]]
    df = spark.createDataFrame(rows, "c string, item string")
    got = {
        (r.src, r.dst)
        for r in cooccurrence_edges(
            df, "c", "item", max_container_size=8
        ).collect()
    }
    want = {("i0", "i1"), ("i0", "i2"), ("i0", "i3"), ("i1", "i2"),
            ("i1", "i3"), ("i2", "i3"), ("a", "b"), ("a", "c"), ("b", "c")}
    assert got == want
    # uncapped join path over the same data keeps the big container
    uncapped = {
        (r.src, r.dst)
        for r in cooccurrence_edges(df, "c", "item").collect()
    }
    assert len(uncapped) == len(want) + 12 * 11 // 2


def test_cooccurrence_null_container_excluded_both_paths(spark):
    """NULL container keys are excluded in BOTH paths (explicit
    filter, r11): a NULL container is not a container, matching the
    equi-join semantics the uncapped path always had. Before r11 the
    capped path's null behavior was an undocumented side effect of its
    gate join (ADVICE r10: the r10 gate dropped nulls, the pre-r10
    gate kept them — neither documented nor tested)."""
    from postgresimporter_spark.operators.graph import cooccurrence_edges

    rows = [
        ("c1", "a"), ("c1", "b"),
        (None, "x"), (None, "y"), (None, "z"),
    ]
    df = spark.createDataFrame(rows, "c string, item string")
    want = {("a", "b")}
    capped = {
        (r.src, r.dst)
        for r in cooccurrence_edges(
            df, "c", "item", max_container_size=10
        ).collect()
    }
    uncapped = {
        (r.src, r.dst) for r in cooccurrence_edges(df, "c", "item").collect()
    }
    counted = {
        (r.src, r.dst, r.n_shared)
        for r in cooccurrence_edges(
            df, "c", "item", max_container_size=10, count_pairs=True
        ).collect()
    }
    assert capped == want and uncapped == want
    assert counted == {("a", "b", 1)}


def test_cooccurrence_duplicate_heavy_all_suspects(spark):
    """The crawl re-post shape (r11): EVERY container exceeds the cap
    in RAW rows via duplicates while none exceeds it in DISTINCT
    items. All containers become raw-count suspects — the adaptive
    gate must neither drop anything nor force an unbounded broadcast,
    and output must equal the uncapped join path exactly."""
    from postgresimporter_spark.operators.graph import cooccurrence_edges

    rows = []
    for c in range(30):
        for i in range(4):          # 4 distinct items
            for _ in range(5):      # x5 duplicates -> 20 raw rows
                rows.append((f"c{c}", f"c{c}i{i}"))
    df = spark.createDataFrame(rows, "c string, item string")
    capped = {
        (r.src, r.dst)
        for r in cooccurrence_edges(
            df, "c", "item", max_container_size=10  # raw 20 > 10 >= distinct 4
        ).collect()
    }
    uncapped = {
        (r.src, r.dst) for r in cooccurrence_edges(df, "c", "item").collect()
    }
    assert capped == uncapped and len(capped) == 30 * 6
