"""Relational graph analytics over the co-purchase graph, plus fuzzy
entity resolution (SURVEY §2 "beyond the reference" tier — the graph /
record-linkage operators a training-data pipeline runs on entity
tables).

The graph is derived, not stored: nodes are parts, and an (undirected)
edge connects two parts that co-occur in at least one order — the same
derivation ``join_basket_copurchase`` uses, kept as plain relational
algebra so Catalyst plans it (hash join on ``l_orderkey``, distinct
for edge dedup).

Operators:

- ``graph_pagerank_parts`` — PageRank, FIXED iteration count (3),
  damping 0.85. The loop is Python building ONE logical plan per
  round over a ``localCheckpoint``-ed edge list (the iterative-
  algorithm lineage pattern proven by ``dedup/cluster.py``); each
  round is join + groupBy-sum — the textbook relational PageRank
  (contributions = rank/out-degree flowing over edges). Because a
  fixed iteration count is just a chained plan, the DuckDB oracle is
  three chained CTEs — the WHOLE iterative computation is value-
  checked, not asserted. The symmetrized graph has no dangling nodes
  (every node has out-degree ≥ 1), so no dangling-mass redistribution
  term is needed.
- ``graph_triangle_count`` — per-node triangle counts via the
  degree-ordered orientation (edges point from the (degree, id)-
  smaller endpoint to the larger). This is the standard O(m^1.5)
  enumeration: orientation caps effective out-degree at ~sqrt(2m), so
  the wedge join never explodes on hub nodes — the same reason the
  algorithm survives power-law graphs at 100 TB. Counts are exact
  integers → bit-identical across engines.
- ``er_fuzzy_part_matches`` — entity resolution over the dirty name
  vocabulary: blocking (shared head noun) → pairwise Levenshtein →
  threshold. The classic blocked record-linkage shape: candidate
  pairs come from an equi-join on the blocking key (never all-pairs),
  and the edit distance runs only inside blocks. Both engines ship a
  byte-identical ``levenshtein``.
- ``graph_link_prediction`` — common-neighbor / Adamic-Adar /
  Jaccard features for the strongest distance-2 non-edges (wedge
  join + anti join; exact-integer top-k ranking; hub-degree cap as
  the wedge-volume control).
- ``graph_label_propagation`` — synchronous 2-round LPA community
  detection (plurality label, min tie-break — pure integer ranking,
  chained-CTE oracle checks both rounds exactly).
- ``graph_link_prediction_capped`` — the 100 TB operating plan:
  support-2 edges (densification control) + hub-degree cap (skew
  control), both applied identically in the oracle.
- ``graph_kcore_membership`` — fixed-round k-core peel (dense-subgraph
  filter); every round value-checked by chained CTEs.

Scale notes (100 TB posture):

- Edge derivation shuffles lineitem once on ``l_orderkey`` (its
  natural key); the distinct is a hash agg on (src, dst). PageRank
  rounds shuffle the rank table on ``src``/``dst`` — node-cardinality,
  not fact-cardinality. A production run would bucket the edge table
  by src so every round's join is exchange-free; the
  ``storage/bucketing.py`` machinery pins that plan shape.
- Triangle counting's orientation step is why this scales: without
  it, a single hub of degree d contributes d^2 wedges; with it,
  out-degree is bounded by ~sqrt(2m) regardless of skew.
- The ER block join is skew-safe the same way all our blocked joins
  are: blocks are vocabulary-scale, and a hot block degrades to
  block_size^2 pairs, never corpus^2. (For name vocabularies that
  are themselves huge, swap the blocking key for the minhash band
  machinery in ``dedup/`` — same plan shape.)

Reference parity: the reference (a 2-script event ETL,
``bronze_assets_to_silver_assets.py``) has no graph or linkage
operators; this module is part of the ABSENT-category fill mandated
by SURVEY §2's "large-scale training-data pipeline" tier.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_tables
from .relational import query


def _node_broadcast(df: DataFrame) -> DataFrame:
    """Broadcast hint for NODE-scale frames (rank/label/degree/
    adjacency tables — the part catalog by construction), gated by
    ``$SPARK_GRAFT_NODE_BROADCAST`` (VERDICT r15 #6). Default ON: on
    this harness (and any deployment whose node catalog is
    dimension-scale) the hint is what keeps the edge list from
    re-shuffling every round. At 100 TB the node set outgrows a driver
    broadcast, and an EXPLICIT hint overrides Spark's size check — it
    fails hard (driver OOM / 8 GB broadcast cap) instead of degrading.
    Set the env var to ``0`` there: every call site degrades to a
    plain join and AQE picks the strategy from runtime sizes — same
    results, pinned by ``test_graph_node_broadcast_gate``."""
    if os.environ.get("SPARK_GRAFT_NODE_BROADCAST", "1").lower() in (
        "0",
        "false",
    ):
        return df
    return F.broadcast(df)


DAMPING = 0.85
TELEPORT = 0.15
PR_ITERS = 3
ER_MAX_DIST = 2

# Shared DuckDB CTE: distinct directed co-purchase edges (both
# directions), so every node has out-degree >= 1 by construction.
_EDGES_CTE = """
    pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (SELECT src, count(*) AS deg FROM pairs GROUP BY src),
    n AS (SELECT count(*) AS n FROM deg)
"""


# applicationId -> {cache key: persisted edge DataFrame}. The graph
# entries (pagerank / triangles / LPA / k-core / link prediction) all
# derive their edge list from a lineitem self-join — previously each
# call re-ran that join, the family's dominant constant factor (VERDICT
# r5 #5). Same discipline as ``similarity.ann._BLOCKKEYS``: bounded —
# at most ``_EDGECACHE_SLOTS`` entries per app (the support-1 family
# graph and the support-2 scale-safe graph coexist; a third key evicts
# + unpersists the oldest), keyed by plan hash + the concrete
# input-file listing so a corpus rewrite at the same path invalidates
# (any Spark rewrite produces fresh part-file names). Release with
# ``unpersist_copurchase_edges()``.
_EDGECACHE: dict[str, dict[tuple[int, tuple[str, ...]], DataFrame]] = {}
_EDGECACHE_SLOTS = 2


def unpersist_copurchase_edges() -> None:
    """Drop every cached co-purchase edge materialization (and the
    derived triangle tables keyed off them)."""
    for slots in _EDGECACHE.values():
        for df in slots.values():
            df.unpersist()
    _EDGECACHE.clear()
    for slots in _TRICACHE.values():
        for dfs in slots.values():
            for df in dfs:
                if isinstance(df, DataFrame):
                    df.unpersist()
    _TRICACHE.clear()


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, min_support: int = 1
) -> DataFrame:
    """Distinct directed (src, dst) co-purchase edges, symmetrized.

    ``min_support`` keeps only pairs co-occurring in at least that many
    orders — the standard densification control: when the fact table
    grows over a FIXED catalog (more orders, same parts), the support-1
    graph saturates toward the complete graph and wedge counts explode;
    raising support restores sparsity proportional to signal, not data
    volume. The family entries pin support=1 (oracle-matched);
    ``graph_link_prediction_capped`` pins support=2 — the scale-safe
    operating point, oracle-matched via a HAVING clause — and the
    scale probe exercises support=2 across the family on the 10×
    corpus.

    The result is session-cached (``_EDGECACHE``): one persisted
    materialization serves the whole graph family."""
    from pyspark import StorageLevel

    l = load_tables(spark, sf_dir)["lineitem"]
    # r15 (guide §2.4): the pair blow-up is generated ROW-LOCALLY from
    # per-order part sets (one groupBy shuffle of the fact keyed on
    # l_orderkey, then a basket-bounded HOF expansion) instead of the
    # previous fact-fact self-join on l_orderkey — identical pair set
    # (collect_set dedups within-order part repeats exactly like the
    # src != dst self-join filter + DISTINCT did), one less join probe
    # over the co-partitioned fact, measured 3.8 → 2.5 s (support-1)
    # and 4.1 → 2.7 s (support-2) at sf0.1. Basket size bounds the
    # expansion (≤ 7 parts/order in TPC-H-shaped data), never corpus
    # size — the same bound the self-join relied on.
    sets = l.groupBy("l_orderkey").agg(F.collect_set("l_partkey").alias("ps"))
    # r16: the pair expansion is TWO CHAINED GENERATORS (explode × explode
    # — rows stream through one codegen stage) instead of the r15 nested
    # transform×transform HOF, which materialized a basket²-element
    # array of structs per order row before exploding it: same multiset
    # of pairs (verified exceptAll-equal both ways), measured 1.9 → 1.4 s
    # wall / 5.7 → 4.2 CPU s steady and 32.6 → 11.3 CPU s on the
    # first-in-session build every bench pass pays.
    pairs = (
        sets.select("l_orderkey", F.explode("ps").alias("src"), "ps")
        .select("l_orderkey", "src", F.explode("ps").alias("dst"))
        .where(F.col("src") != F.col("dst"))
    )
    if min_support <= 1:
        edges = pairs.select("src", "dst").distinct()
    else:
        edges = (
            pairs.groupBy("src", "dst")
            .agg(F.count_distinct("l_orderkey").alias("support"))
            .where(F.col("support") >= min_support)
            .select("src", "dst")
        )
    app = spark.sparkContext.applicationId
    # The (semanticHash, inputFiles) tuple IS the key — collapsing it
    # through hash() would let a Python int collision silently serve
    # the wrong persisted edge set (ADVICE r6).
    key = (edges.semanticHash(), tuple(sorted(l.inputFiles())))
    slots = _EDGECACHE.setdefault(app, {})
    hit = slots.get(key)
    if hit is not None:
        return hit
    while len(slots) >= _EDGECACHE_SLOTS:  # bounded: evict oldest
        oldest = next(iter(slots))
        slots.pop(oldest).unpersist()
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    slots[key] = edges
    return edges


def _pr_round_sql(prev: str, cur: str) -> str:
    """One PageRank round as a CTE body (DuckDB oracle)."""
    return f"""
    {cur} AS (
        SELECT p.dst AS node,
               0.15 / max(n.n) + 0.85 * sum({prev}.pr / d.deg) AS pr
        FROM pairs p
        JOIN deg d ON d.src = p.src
        JOIN {prev} ON {prev}.node = p.src
        CROSS JOIN n
        GROUP BY p.dst
    )"""


@query(
    "graph_pagerank_parts",
    f"""
    WITH {_EDGES_CTE},
    r0 AS (SELECT deg.src AS node, 1.0 / n.n AS pr FROM deg CROSS JOIN n),
    {_pr_round_sql('r0', 'r1')},
    {_pr_round_sql('r1', 'r2')},
    {_pr_round_sql('r2', 'r3')}
    SELECT r3.node AS p_partkey,
           round(r3.pr * n.n, 4) AS pr_scaled,
           deg.deg AS degree
    FROM r3 JOIN deg ON deg.src = r3.node CROSS JOIN n
    """,
)
def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-iteration PageRank over the co-purchase part graph.

    The Python loop only chains the plan; data never reaches the
    driver except the node count (one scalar). ``links`` (edges ⋈
    out-degree) is localCheckpoint-ed once so the three rounds reuse
    the materialized edge list instead of re-deriving it from
    lineitem per round (and so the final plan is O(iters), not
    O(iters × edge-derivation)). ``pr_scaled`` = pr × N — the
    size-independent relative importance, stable to round(4) across
    engines because each round is the same IEEE join/sum arithmetic.
    The rank vector is broadcast into each round (node set = part
    catalog, dimension-scale by construction — see ``pagerank``).
    """
    return pagerank(_copurchase_edges(spark, sf_dir), broadcast_ranks=True)


def pagerank(
    edges: DataFrame,
    iters: int = PR_ITERS,
    damping: float = DAMPING,
    teleport: float = TELEPORT,
    broadcast_ranks: bool = False,
) -> DataFrame:
    """PageRank core over a symmetrized (src, dst) edge DataFrame.

    ``teleport`` is passed as its own literal rather than computed as
    ``1 - damping``: the oracle SQL uses the literal 0.15, and IEEE
    ``1.0 - 0.85`` is NOT the same double as the literal ``0.15`` —
    deriving it would break the bit-stable cross-engine parity.

    ``broadcast_ranks=True`` broadcasts the node-scale rank vector
    into each round's join so the EDGE list never shuffles after its
    one materialization (per-round cost = edge scan + a node-scale
    partial-agg shuffle; identical output, r8 measured ~15% off the
    parts graph). Opt-in only: valid when the node set is
    dimension-scale (the co-purchase graph's nodes are the part
    catalog BY CONSTRUCTION); on a graph with fact-scale nodes leave
    it False and rely on bucketed/co-partitioned edges (the posture
    ``test_pagerank_round_one_exchange_on_bucketed_edges`` pins)."""
    def build(e: DataFrame) -> tuple[DataFrame, DataFrame, int]:
        deg = e.groupBy("src").agg(F.count("*").alias("deg"))
        links = e.join(deg, "src").localCheckpoint(eager=False)
        return deg, links, links.select("src").distinct().count()

    # (deg, links, n) is session-cached per edge frame: repeated
    # PageRank calls (bench steady state, probe re-runs) skip the
    # links rematerialization and the node-count job.
    deg, links, n = _derived_tables("pr_links", edges, build)

    ranks = deg.select(F.col("src").alias("node"), F.lit(1.0 / n).alias("pr"))
    for _ in range(iters):
        rhs = _node_broadcast(ranks) if broadcast_ranks else ranks
        ranks = (
            links.join(rhs, links.src == rhs.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(
                (
                    F.lit(teleport / n)
                    + F.lit(damping) * F.sum(F.col("pr") / F.col("deg"))
                ).alias("pr")
            )
        )
    return (
        ranks.join(deg, ranks.node == deg.src)
        .select(
            F.col("node").alias("p_partkey"),
            F.round(F.col("pr") * n, 4).alias("pr_scaled"),
            F.col("deg").alias("degree"),
        )
    )


@query(
    "graph_triangle_count",
    """
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM pairs GROUP BY src),
    oriented AS (
        SELECT p.src, p.dst
        FROM pairs p
        JOIN deg ds ON ds.node = p.src
        JOIN deg dd ON dd.node = p.dst
        WHERE (ds.deg, ds.node) < (dd.deg, dd.node)
    ),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM oriented e1
        JOIN oriented e2 ON e2.src = e1.dst
        JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    pernode AS (
        SELECT node, count(*) AS triangles
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY node
    )
    SELECT p.node AS p_partkey, p.triangles, d.deg AS degree
    FROM pernode p JOIN deg d ON d.node = p.node
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts, degree-ordered orientation.

    Each undirected edge is kept once, pointing from its (degree, id)-
    smaller endpoint to the larger — a total order, so every triangle
    is enumerated exactly once as a < b < c in orientation order and
    the wedge join's fan-out is bounded by ~sqrt(2m) per node even on
    hot hubs. Counts are exact integers; no float compare risk.
    """
    return triangle_counts(_copurchase_edges(spark, sf_dir))


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Triangle-count core over a symmetrized (src, dst) edge frame.

    The input must be DUPLICATE-FREE: ``array_intersect`` deduplicates
    closing vertices, so a multigraph's repeated edges do NOT multiply
    triangle counts the way the old three-way wedge join did (ADVICE
    r7). Every in-repo caller feeds ``_copurchase_edges`` (distinct by
    construction); external callers must ``.distinct()`` first.
    """
    deg, pernode = _triangle_tables(edges)
    return pernode.join(deg, "node").select(
        F.col("node").alias("p_partkey"), "triangles", F.col("deg").alias("degree")
    )


# (applicationId, kind) -> {(semanticHash, inputFiles): result tuple}.
# Generic session cache for tables DERIVED from a cached edge frame:
# the triangle consumers share one (deg, pernode) pair, the PageRank
# rounds share one materialized (links, n). Same bounded discipline
# and collision-safe key as ``_EDGECACHE``; DataFrame elements are
# persisted on insert and unpersisted on eviction; cleared by
# ``unpersist_copurchase_edges()``. ``_TRICACHE`` remains the public
# test hook name for the whole derived-cache store.
_TRICACHE: dict[tuple[str, str], dict[tuple, tuple]] = {}
_TRICACHE_SLOTS = 2


def _derived_tables(kind: str, edges: DataFrame, build) -> tuple:
    """Session-cached ``build(edges)`` result (a tuple; DataFrame
    elements persisted). Falls back to an uncached build when the
    frame has no stable identity (e.g. local-relation tests)."""
    from pyspark import StorageLevel

    try:
        spark = edges.sparkSession
        app = spark.sparkContext.applicationId
        key = (edges.semanticHash(), tuple(sorted(edges.inputFiles())))
    except Exception:
        return build(edges)
    slots = _TRICACHE.setdefault((app, kind), {})
    hit = slots.get(key)
    if hit is not None:
        return hit
    while len(slots) >= _TRICACHE_SLOTS:
        oldest = next(iter(slots))
        for item in slots.pop(oldest):
            if isinstance(item, DataFrame):
                item.unpersist()
    out = tuple(
        item.persist(StorageLevel.MEMORY_AND_DISK)
        if isinstance(item, DataFrame)
        else item
        for item in build(edges)
    )
    slots[key] = out
    return out


def _triangle_tables(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(degree table, per-node triangle counts), session-cached: both
    triangle consumers (``graph_triangle_count`` and
    ``graph_clustering_profile``) run the SAME orientation + per-node
    enumeration over the same edge frame — the family's second-largest
    constant factor after the edge derivation — and both results are
    NODE-scale, cheap to persist."""

    def build(e: DataFrame) -> tuple[DataFrame, DataFrame]:
        deg, oriented = _orient(e)
        return deg, _per_node_triangles(oriented)

    return _derived_tables("tri", edges, build)


def _orient(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(degree table, degree-ordered orientation) of a symmetric edge
    frame: each undirected edge kept once, pointing from its
    (degree, id)-smaller endpoint to the larger — a total order, so
    every triangle is enumerated exactly once and per-node out-degree
    is ~sqrt(2m)-bounded even on hot hubs. The degree sides are
    node-scale (the part catalog), hence broadcast."""
    deg = (
        edges.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
        .localCheckpoint(eager=False)  # node-scale; reused downstream
    )
    ds = deg.select(F.col("node").alias("src"), F.col("deg").alias("sdeg"))
    dd = deg.select(F.col("node").alias("dst"), F.col("deg").alias("ddeg"))
    oriented = (
        edges.join(_node_broadcast(ds), "src")
        .join(_node_broadcast(dd), "dst")
        .where(
            (F.col("sdeg") < F.col("ddeg"))
            | ((F.col("sdeg") == F.col("ddeg")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    return deg, oriented


def _per_node_triangles(oriented: DataFrame) -> DataFrame:
    """Per-node triangle counts via the EDGE-ITERATOR form: build the
    oriented adjacency list per node (total cells = |oriented edges| —
    EDGE scale, so the broadcast below is justified only while the
    support-capped edge list stays modest; see the escape hatch at the
    end of this docstring), then for each oriented
    edge (a,b) the closing vertices are ``array_intersect(adj(a),
    adj(b))`` — the wedge filtering happens inside a codegen'd array
    expression instead of materializing the wedge stream through a
    shuffle join. Wired into BOTH ``graph_triangle_count`` and (r8)
    ``graph_clustering_profile``, replacing the ~50M-row sf0.1 wedge
    shuffle that made the profile the most expensive bench query
    (~25 s of the r7 headline; see BENCH_r08 for the measured cut —
    identical output by construction, parity re-certified). At a scale where the adjacency table outgrows broadcast
    (edges far beyond catalog-scale — which edge SUPPORT scaling
    prevents, see ``_copurchase_edges``), set
    ``SPARK_GRAFT_NODE_BROADCAST=0`` (r16: the two hints go through
    ``_node_broadcast``) and AQE falls back to shuffle joins with the
    same plan semantics."""
    adj = oriented.groupBy(F.col("src").alias("node")).agg(
        F.sort_array(F.collect_list("dst")).alias("nbrs")
    )
    tri = (
        oriented.join(
            _node_broadcast(
                adj.select(F.col("node").alias("src"), F.col("nbrs").alias("na"))
            ),
            "src",
        )
        .join(
            _node_broadcast(
                adj.select(F.col("node").alias("dst"), F.col("nbrs").alias("nb"))
            ),
            "dst",
        )
        .select(
            F.col("src").alias("a"),
            F.col("dst").alias("b"),
            F.explode(F.array_intersect("na", "nb")).alias("c"),
        )
    )
    return (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("triangles"))
    )


@query(
    "er_fuzzy_part_matches",
    f"""
    WITH names AS (
        SELECT p_name,
               split_part(p_name, ' ', 2) AS blk,
               count(*) AS n_parts,
               min(p_partkey) AS canon_key
        FROM part
        GROUP BY 1, 2
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           levenshtein(a.p_name, b.p_name) AS edit_dist,
           a.n_parts AS parts_a, b.n_parts AS parts_b,
           a.canon_key AS canon_a, b.canon_key AS canon_b
    FROM names a
    JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= {ER_MAX_DIST}
    """,
)
def er_fuzzy_part_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution over the part-name vocabulary.

    Shape: aggregate to the name vocabulary (the ER universe is
    distinct surface forms, not rows), equi-join on the blocking key
    (head noun), Levenshtein ≤ 2 inside blocks only. The survivor
    key (min partkey per name) makes the output directly usable as a
    merge map. At 100 TB the vocabulary aggregation is the only
    fact-sized shuffle; the pair join is vocabulary × block-local.
    """
    p = load_tables(spark, sf_dir)["part"]
    names = p.groupBy(
        F.col("p_name"), F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("blk")
    ).agg(
        F.count("*").alias("n_parts"),
        F.min("p_partkey").alias("canon_key"),
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("blk"),
        F.col("n_parts").alias("parts_a"),
        F.col("canon_key").alias("canon_a"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("blk"),
        F.col("n_parts").alias("parts_b"),
        F.col("canon_key").alias("canon_b"),
    )
    return (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .where(F.col("edit_dist") <= ER_MAX_DIST)
        .select(
            "name_a", "name_b", "edit_dist",
            "parts_a", "parts_b", "canon_a", "canon_b",
        )
    )


LP_TOP_K = 50


@query(
    "graph_link_prediction",
    f"""
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM pairs GROUP BY src),
    wedge AS (
        SELECT e1.dst AS a, e1.src AS b, e2.dst AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.src = e1.src AND e1.dst < e2.dst
    ),
    cand AS (
        SELECT w.a, w.c,
               count(*) AS common_neighbors,
               sum(1.0 / ln(d.deg)) AS adamic_adar
        FROM wedge w
        JOIN deg d ON d.node = w.b
        LEFT JOIN pairs e ON e.src = w.a AND e.dst = w.c
        WHERE e.src IS NULL
        GROUP BY w.a, w.c
    )
    SELECT cand.a AS part_a, cand.c AS part_b,
           cand.common_neighbors,
           round(cand.adamic_adar, 4) AS adamic_adar,
           round(CAST(cand.common_neighbors AS DOUBLE)
                 / CAST(da.deg + dc.deg - cand.common_neighbors AS DOUBLE), 4)
             AS jaccard
    FROM cand
    JOIN deg da ON da.node = cand.a
    JOIN deg dc ON dc.node = cand.c
    ORDER BY cand.common_neighbors DESC, cand.a, cand.c
    LIMIT {LP_TOP_K}
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-prediction features for the strongest NON-edges: pairs at
    distance 2 ranked by common-neighbor count, with Adamic-Adar
    (sum of 1/ln(deg) over shared neighbors — rare neighbors weigh
    more) and neighborhood Jaccard.

    Shape: one wedge join through the shared neighbor b (a < c dedups
    each wedge), an anti join against the edge list to keep non-edges
    only, then a (a, c) rollup. The ORDER BY ... LIMIT ranks by the
    EXACT integer common-neighbor count with key tiebreaks, so the
    selected top-k set is deterministic cross-engine (a double score
    at the boundary would not be). At scale the wedge join is the
    triangle-count join (same orientation trick applies if needed);
    the anti join is edge-cardinality.
    """
    return link_prediction(_copurchase_edges(spark, sf_dir))


LP_CAP = 150
LP_SUPPORT = 2


@query(
    "graph_link_prediction_capped",
    f"""
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
        HAVING count(DISTINCT a.l_orderkey) >= {LP_SUPPORT}
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM pairs GROUP BY src),
    centers AS (
        SELECT p.src, p.dst FROM pairs p
        JOIN deg d ON d.node = p.src
        WHERE d.deg <= {LP_CAP}
    ),
    wedge AS (
        SELECT e1.dst AS a, e1.src AS b, e2.dst AS c
        FROM centers e1
        JOIN centers e2 ON e2.src = e1.src AND e1.dst < e2.dst
    ),
    cand AS (
        SELECT w.a, w.c,
               count(*) AS common_neighbors,
               sum(1.0 / ln(d.deg)) AS adamic_adar
        FROM wedge w
        JOIN deg d ON d.node = w.b
        LEFT JOIN pairs e ON e.src = w.a AND e.dst = w.c
        WHERE e.src IS NULL
        GROUP BY w.a, w.c
    )
    SELECT cand.a AS part_a, cand.c AS part_b,
           cand.common_neighbors,
           round(cand.adamic_adar, 4) AS adamic_adar,
           round(CAST(cand.common_neighbors AS DOUBLE)
                 / CAST(da.deg + dc.deg - cand.common_neighbors AS DOUBLE), 4)
             AS jaccard
    FROM cand
    JOIN deg da ON da.node = cand.a
    JOIN deg dc ON dc.node = cand.c
    ORDER BY cand.common_neighbors DESC, cand.a, cand.c
    LIMIT {LP_TOP_K}
    """,
)
def graph_link_prediction_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction with BOTH production knobs ENGAGED — the plan
    you would actually run at 100 TB, value-checked (VERDICT r5 #3:
    the uncapped support-1 entry certifies exactness but enumerates
    every open wedge, Σ C(deg(b), 2); it stays registered as the
    exactness gauge).

    The two knobs control the two distinct blow-up modes:

    - ``min_support=2`` (``LP_SUPPORT``) (edge support) is the DENSIFICATION
      control: as the fact table grows over a fixed catalog, the
      support-1 graph saturates toward completeness (sf0.001 → sf0.1:
      18k → 2.4M edges, median degree 119, 148M open wedges — measured),
      while the support-2 graph stays signal-sized (4.6k → 7.1k edges)
      because random co-occurrence doesn't repeat. Recommending links
      from ONE shared basket is noise anyway; support ≥ 2 is the
      association-rule floor.
    - ``max_center_degree=150`` (``LP_CAP``) (hub cap) is the SKEW control: on
      a power-law graph a single hub center contributes C(deg, 2)
      wedges; capping drops only the weakest-evidence witnesses
      (Adamic-Adar already discounts them by 1/ln(deg)).

    Neighbor sets for the Jaccard denominator and the non-edge anti
    join still use the full (support-filtered) graph; only wedge
    enumeration is capped. The oracle CTE applies the identical
    support filter (HAVING on distinct orders) and cap, so the
    scale-safe ranking itself is hash-verified — not just "output is a
    subset"."""
    return link_prediction(
        _copurchase_edges(spark, sf_dir, min_support=LP_SUPPORT),
        max_center_degree=LP_CAP,
    )


def link_prediction(
    edges: DataFrame,
    top_k: int = LP_TOP_K,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Link-prediction core over a symmetrized edge frame.

    Counting ALL common neighbors enumerates every open wedge
    (Σ C(deg(b), 2)) — orientation cannot prune open wedges the way
    it prunes triangle closure, so hub centers dominate the cost on
    dense graphs. ``max_center_degree`` is the production knob: wedge
    centers above the cap are dropped before pairing (hubs contribute
    the weakest Adamic-Adar evidence — 1/ln(deg) — so the ranking is
    barely disturbed while the wedge count drops from Σ C(deg,2) to
    Σ C(min(deg, cap), 2)). The registry entry pins cap=None for
    oracle parity; the probe corpus measures both.
    """
    deg = edges.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("deg"))
    centers = edges
    if max_center_degree is not None:
        ok_centers = deg.where(F.col("deg") <= max_center_degree).select(
            F.col("node").alias("src")
        )
        centers = edges.join(ok_centers, "src")
    e1 = centers.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    e2 = centers.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    wedge = e1.join(e2, "b").where(F.col("a") < F.col("c"))
    # Pin the CANDIDATE-PAIR exchange (VERDICT r13 #2): the wedge
    # fan-out's output is the entry's dominant intermediate, and AQE's
    # coalescePartitions sized its exchange from session-varying map
    # statistics — same values, but CPU swung >2× between bench
    # sessions (the r13 cpu_min alarm, BENCH_NOTES.md). An explicit-
    # count repartition on the pair key gives the shuffle
    # REPARTITION_BY_NUM origin, which AQE is contractually forbidden
    # to coalesce — the candidate pipeline runs defaultParallelism-
    # wide every session — and because (a, c) is exactly the anti-
    # join/groupBy key, BOTH downstream operators reuse the pinned
    # partitioning (the broadcast edge/deg joins preserve it), so this
    # REPLACES the AQE-managed exchange rather than adding one:
    # measured at sf0.1, wall 2.7→2.2 s and process-tree CPU 53→31 s
    # vs the unpinned plan. defaultParallelism, not a literal, so a
    # 1000-executor cluster gets its own width. Plan pin:
    # test_plan_shapes::test_link_prediction_wedge_exchange_pinned.
    # Spark Connect caveat (ADVICE r14): ``sparkContext`` is a
    # JVM-internal a Connect client cannot reach, so the lookup is
    # guarded like stats._global_row_numbers' size estimate — the
    # fallback pins to spark.sql.shuffle.partitions, which any
    # deployment sizes to its cluster width anyway.
    spark = edges.sparkSession
    try:
        pin_width = spark.sparkContext.defaultParallelism
    except Exception:  # Spark Connect: no sparkContext on the client
        pin_width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    wedge = wedge.repartition(pin_width, "a", "c")
    non_edge = wedge.join(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "left_anti",
    )
    cand = (
        non_edge.join(
            deg.select(F.col("node").alias("b"), F.col("deg").alias("bdeg")), "b"
        )
        .groupBy("a", "c")
        .agg(
            F.count("*").alias("common_neighbors"),
            F.sum(F.lit(1.0) / F.log(F.col("bdeg"))).alias("adamic_adar"),
        )
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    dc = deg.select(F.col("node").alias("c"), F.col("deg").alias("dc"))
    return (
        cand.join(da, "a")
        .join(dc, "c")
        .select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            "common_neighbors",
            F.round("adamic_adar", 4).alias("adamic_adar"),
            F.round(
                F.col("common_neighbors").cast("double")
                / (F.col("da") + F.col("dc") - F.col("common_neighbors")).cast("double"),
                4,
            ).alias("jaccard"),
            F.col("a").alias("_oa"),
            F.col("c").alias("_oc"),
        )
        .orderBy(F.col("common_neighbors").desc(), "_oa", "_oc")
        .limit(top_k)
        .drop("_oa", "_oc")
    )


KCORE_K = 60
KCORE_ROUNDS = 2


@query(
    "graph_kcore_membership",
    f"""
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    d0 AS (SELECT src, count(*) AS deg FROM pairs GROUP BY src),
    k0 AS (SELECT src FROM d0 WHERE deg >= {KCORE_K}),
    e1 AS (
        SELECT p.src, p.dst FROM pairs p
        JOIN k0 a ON a.src = p.src
        JOIN k0 b ON b.src = p.dst
    ),
    d1 AS (SELECT src, count(*) AS deg FROM e1 GROUP BY src),
    k1 AS (SELECT src FROM d1 WHERE deg >= {KCORE_K}),
    e2 AS (
        SELECT p.src, p.dst FROM e1 p
        JOIN k1 a ON a.src = p.src
        JOIN k1 b ON b.src = p.dst
    ),
    fd AS (SELECT src AS p_partkey, count(*) AS core_degree FROM e2 GROUP BY 1)
    SELECT fd.p_partkey, d0.deg AS degree, fd.core_degree
    FROM fd JOIN d0 ON d0.src = fd.p_partkey
    """,
)
def graph_kcore_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core peel, FIXED round count (the dense-subgraph filter a
    curation pass runs before community/link analysis — nodes that
    survive iterated low-degree pruning form the stable core).

    Like PageRank/LPA, the peel runs a FIXED number of rounds
    (``KCORE_ROUNDS`` = 2) so the whole computation is one chained plan and
    the DuckDB oracle value-checks every round (full convergence is the
    same loop run to fixpoint; fixed rounds are the oracle-checkable
    prefix). Each round: degree count + semi-join filter on BOTH
    endpoints — two node-cardinality shuffles per round over the shared
    cached edge list, never fact-cardinality. Exact integers
    throughout; output is the surviving nodes with original and
    post-peel degree.
    """
    edges = _copurchase_edges(spark, sf_dir)
    d0 = edges.groupBy("src").agg(F.count("*").alias("deg"))
    surv = edges
    for _ in range(KCORE_ROUNDS):
        deg = surv.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.where(F.col("deg") >= KCORE_K).select("src")
        surv = (
            surv.join(keep, "src")
            .join(keep.select(F.col("src").alias("dst")), "dst")
            .select("src", "dst")
        )
    fd = surv.groupBy(F.col("src").alias("p_partkey")).agg(
        F.count("*").alias("core_degree")
    )
    return fd.join(
        d0.select(F.col("src").alias("p_partkey"), F.col("deg").alias("degree")),
        "p_partkey",
    ).select("p_partkey", "degree", "core_degree")


LPA_ITERS = 2


def _lpa_round_sql(prev: str, cur: str) -> str:
    """One synchronous label-propagation round (DuckDB oracle):
    every node adopts the most frequent label among its neighbors,
    smallest label winning ties — integer counts only, so the round
    is bit-deterministic."""
    return f"""
    {cur} AS (
        SELECT node, label FROM (
            SELECT e.dst AS node, l.label,
                   row_number() OVER (
                       PARTITION BY e.dst
                       ORDER BY count(*) DESC, l.label
                   ) AS rk
            FROM pairs e JOIN {prev} l ON l.node = e.src
            GROUP BY e.dst, l.label
        ) WHERE rk = 1
    )"""


@query(
    "graph_label_propagation",
    f"""
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    l0 AS (SELECT src AS node, src AS label FROM pairs GROUP BY src),
    {_lpa_round_sql('l0', 'l1')},
    {_lpa_round_sql('l1', 'l2')},
    sizes AS (SELECT label, count(*) AS community_size FROM l2 GROUP BY label)
    SELECT l2.node AS p_partkey, l2.label AS community, s.community_size
    FROM l2 JOIN sizes s ON s.label = l2.label
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation, 2 rounds.

    Unlike connected components (``dedup/cluster.py`` — reachability),
    LPA finds DENSE regions: each node adopts its neighborhood's
    plurality label. The deterministic variant (count-desc,
    min-label tie-break) makes every round a join + count + argmax
    over integers — no float compare anywhere, so the chained-CTE
    oracle checks the full computation exactly. Per round: the
    node-scale label vector rides a BROADCAST into the edge join
    (same dimension-scale-nodes justification as
    ``graph_pagerank_parts``), so the edge list never re-shuffles;
    the plurality count + argmax shuffle node-scale partials only
    (the argmax is a ``max_by`` hash-aggregate, not a window sort —
    see the loop comment).
    """
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=False)
    # ROUND 1 collapses algebraically (r15, guide §1.2 step 1): with
    # the identity seed (label(v) = v) over a DISTINCT edge set, every
    # (dst, label) group holds exactly one row — c = 1 for all — so
    # the plurality argmax (count desc, min label) degenerates to
    # "smallest neighbor label": one node-scale groupBy-min, no label
    # join and no edge-cardinality (dst, label) hash aggregation (the
    # most expensive aggregation of the old plan: 2.4M all-distinct
    # groups at sf0.1). Identical values by the identity; the chained
    # CTE oracle (unchanged) certifies them at all SFs.
    labels = edges.groupBy(F.col("dst").alias("node")).agg(
        F.min("src").alias("label")
    )
    for _ in range(LPA_ITERS - 1):
        counts = (
            edges.join(_node_broadcast(labels), edges.src == labels.node)
            .groupBy(F.col("dst").alias("node"), "label")
            .agg(F.count("*").alias("c"))
        )
        # plurality pick as an ARGMAX aggregate, not a window: max_by
        # over (count, -label) == the oracle's row_number((c DESC,
        # label ASC)) = 1 pick (labels are positive part keys, so
        # negation flips the tie-break order), but it runs as a
        # hash-aggregate with map-side partials instead of a per-node
        # SORT — same shuffle count, no sort: 5.4 s → 4.0 s warm at
        # sf0.1 (r8 measured, outputs pinned identical).
        labels = counts.groupBy("node").agg(
            F.max_by(
                "label", F.struct(F.col("c"), (-F.col("label")).alias("nl"))
            ).alias("label")
        )
    sizes = labels.groupBy("label").agg(F.count("*").alias("community_size"))
    # sizes is community-scale but derived (no stats) -> hint, else SMJ
    return labels.join(_node_broadcast(sizes), "label").select(
        F.col("node").alias("p_partkey"),
        F.col("label").alias("community"),
        "community_size",
    )


@query(
    "graph_clustering_profile",
    """
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM pairs GROUP BY src),
    oriented AS (
        SELECT p.src, p.dst
        FROM pairs p
        JOIN deg ds ON ds.node = p.src
        JOIN deg dd ON dd.node = p.dst
        WHERE (ds.deg, ds.node) < (dd.deg, dd.node)
    ),
    tri AS (
        SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
        FROM oriented e1
        JOIN oriented e2 ON e2.src = e1.dst
        JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    pernode AS (
        SELECT node, count(*) AS triangles
        FROM (SELECT a AS node FROM tri
              UNION ALL SELECT b FROM tri
              UNION ALL SELECT c FROM tri)
        GROUP BY node
    ),
    cc AS (
        SELECT d.deg,
               CAST(coalesce(p.triangles, 0) AS BIGINT) AS tri_n,
               2.0 * CAST(coalesce(p.triangles, 0) AS DOUBLE)
                 / (CAST(d.deg AS DOUBLE) * (CAST(d.deg AS DOUBLE) - 1.0))
                 AS cc
        FROM deg d LEFT JOIN pernode p ON p.node = d.node
        WHERE d.deg >= 2
    )
    SELECT CAST(length(bin(deg)) - 1 AS BIGINT) AS degree_bucket,
           CAST(count(*) AS BIGINT) AS nodes,
           CAST(sum(tri_n) AS BIGINT) AS triangle_slots,
           round(avg(CAST(round(cc * 1000000) AS BIGINT)) / 1000000.0, 4)
             AS avg_cc,
           round(min(cc), 4) AS min_cc,
           round(max(cc), 4) AS max_cc
    FROM cc GROUP BY 1
    """,
)
def graph_clustering_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient profile by log2-degree bucket: how
    tightly each degree class's neighborhoods close into triangles
    (cc = 2T / deg(deg-1)) — the curvature summary that tells you
    whether the co-purchase graph is clustered or random at each
    scale, and the densification early-warning beside
    ``graph_triangle_count``.

    Reuses the session-cached ``_copurchase_edges`` materialization
    and the shared ``_orient`` + ``_per_node_triangles`` edge-iterator
    core (r8 — previously this inlined the old three-way wedge join,
    the single most expensive bench plan at ~25 s of the sf0.1
    headline; the adjacency-broadcast ``array_intersect`` form closes
    wedges inside a codegen'd expression instead of shuffling the
    wedge stream). Unlike ``graph_triangle_count`` the per-node join
    is LEFT: zero-triangle nodes count toward their bucket's average
    with cc = 0, which the inner-join form silently drops. The log2 bucket is computed as
    ``length(bin(deg)) - 1`` — pure integer bit length on both
    engines; ``floor(ln(deg)/ln 2)`` would flip at exact powers of two
    on libm ulp differences. Each cc value is a fixed IEEE expression
    of exact integers, so per-row min/max agree to round(4); the
    bucket MEAN is computed over a per-row integer micro-grid
    (round(cc*1e6) as BIGINT) so its sum is exact and order-free.
    """
    edges = _copurchase_edges(spark, sf_dir)
    deg, pernode = _triangle_tables(edges)
    tri_n = F.coalesce(F.col("triangles"), F.lit(0))
    degd = F.col("deg").cast("double")
    cc = (
        deg.where(F.col("deg") >= 2)
        .join(_node_broadcast(pernode), "node", "left")  # node-scale, derived
        .select(
            "deg",
            tri_n.cast("long").alias("tri_n"),
            (
                F.lit(2.0) * tri_n.cast("double") / (degd * (degd - F.lit(1.0)))
            ).alias("cc"),
        )
    )
    return cc.groupBy(
        (F.length(F.bin("deg")) - F.lit(1)).cast("long").alias("degree_bucket")
    ).agg(
        F.count("*").cast("long").alias("nodes"),
        F.sum("tri_n").cast("long").alias("triangle_slots"),
        # Boundary-safe mean (ADVICE r6): quantize each cc to an exact
        # integer micro-grid FIRST (one deterministic IEEE round per
        # row), then average — the partial-agg sum is then a sum of
        # exact integers (< 2^53), immune to cross-engine summation
        # order; a raw avg(double) could land on an x.xxxx5 boundary
        # differently per engine (the events_twap lesson).
        F.round(
            F.avg(F.round(F.col("cc") * 1000000).cast("long")) / 1000000.0, 4
        ).alias("avg_cc"),
        F.round(F.min("cc"), 4).alias("min_cc"),
        F.round(F.max("cc"), 4).alias("max_cc"),
    )


@query(
    "graph_assortativity",
    """
    WITH pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
        GROUP BY 1, 2
    ),
    deg AS (SELECT src AS node, count(*) AS deg FROM pairs GROUP BY src),
    xy AS (
        SELECT CAST(ds.deg AS BIGINT) AS x, CAST(dd.deg AS BIGINT) AS y
        FROM pairs p
        JOIN deg ds ON ds.node = p.src
        JOIN deg dd ON dd.node = p.dst
    ),
    s AS (
        SELECT CAST(count(*) AS DOUBLE) AS m,
               CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
               CAST(sum(x * x) AS DOUBLE) AS sxx,
               CAST(sum(y * y) AS DOUBLE) AS syy,
               CAST(sum(x * y) AS DOUBLE) AS sxy
        FROM xy
    )
    SELECT CAST(m AS BIGINT) AS n_directed_edges,
           round(sx / m, 4) AS mean_degree,
           round((m * sxy - sx * sy)
                 / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)), 4)
             AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the co-purchase graph: the Pearson
    correlation of endpoint degrees over every directed edge — do
    hub products co-occur with hubs (assortative, r > 0) or with
    niche products (disassortative, r < 0)? The one-number structure
    summary beside ``graph_clustering_profile``'s curvature buckets.

    Reuses the session-cached edge materialization; the per-edge
    (deg(src), deg(dst)) pairs come from two node-keyed broadcast-able
    joins, then everything reduces to six exact-integer sums — one
    edge-linear pass, no wedge enumeration, so this stays cheap even
    where the triangle family densifies. Both engines form identical
    doubles from the integer sums (fixed IEEE tree).
    """
    edges = _copurchase_edges(spark, sf_dir)
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    ds = deg.select(F.col("node").alias("src"), F.col("deg").alias("x"))
    dd = deg.select(F.col("node").alias("dst"), F.col("deg").alias("y"))
    # Explicit hints: the degree table is node-scale (part catalog)
    # but DERIVED, so Catalyst has no size stats and falls back to two
    # edge-list sort-merge shuffles without them (caught in PLANS.md).
    xy = edges.join(_node_broadcast(ds), "src").join(_node_broadcast(dd), "dst").select(
        F.col("x").cast("long").alias("x"), F.col("y").cast("long").alias("y")
    )
    s = xy.agg(
        F.count("*").cast("double").alias("m"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return s.select(
        m.cast("long").alias("n_directed_edges"),
        F.round(sx / m, 4).alias("mean_degree"),
        F.round(
            (m * sxy - sx * sy)
            / F.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)),
            4,
        ).alias("assortativity"),
    )


# --- bounded multi-source BFS (k-hop reachability) --------------------------

KHOP_SOURCES = 3
KHOP_HOPS = 3


def _khop_round_sql(prev: str, cur: str, h: int) -> str:
    """One BFS relaxation round (DuckDB oracle): expand the whole
    distance table over the edges at hop cost ``h``, keep the min.
    Expanding already-settled nodes is a no-op under min (a settled
    node at d <= h-2 reaches neighbors at <= h-1 < h), so this naive
    full-expand is value-identical to the Spark side's frontier-only
    expansion — the oracle checks the SEMANTICS, the Spark plan keeps
    the SCALE shape."""
    return f"""
    {cur} AS (
        SELECT node, min(hops) AS hops FROM (
            SELECT node, hops FROM {prev}
            UNION ALL
            SELECT p.dst AS node, {h} AS hops
            FROM {prev} JOIN pairs p ON p.src = {prev}.node
        ) GROUP BY node
    )"""


def khop_distances(
    edges: DataFrame,
    sources: DataFrame,
    hops: int = KHOP_HOPS,
    broadcast_frontier: bool = True,
) -> DataFrame:
    """Minimum hop distance (<= ``hops``) from a source set — bounded
    multi-source BFS as ``hops`` chained relational rounds, the blast-
    radius / k-hop-neighborhood primitive (feature extraction, impact
    analysis) the iterative family (PageRank / LPA / k-core) lacked.

    Each round expands ONLY the newest frontier (nodes first reached
    last round) — textbook BFS: settled nodes cannot improve any
    neighbor under min — then folds the reached set into the distance
    table with a node-scale groupBy-min. Per-round cost is
    |frontier ⋈ edges| + a node-cardinality shuffle; the edge list
    never shuffles (same discipline as ``pagerank``'s broadcast_ranks
    mode: the distance table is node-scale by construction, so it
    broadcasts; on fact-scale node sets set
    ``broadcast_frontier=False`` and pre-bucket the edges).

    ``sources`` is a (node) DataFrame; distances start at 0 there.
    Unreached nodes are absent from the result (not +inf rows) — at
    100 TB the k-hop neighborhood is the small output, the node
    catalog is not.
    """
    hint = _node_broadcast if broadcast_frontier else (lambda df: df)
    dist = sources.select("node").withColumn("hops", F.lit(0))
    for h in range(1, hops + 1):
        frontier = dist.where(F.col("hops") == h - 1).select("node")
        reached = (
            edges.join(hint(frontier), edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"), F.lit(h).alias("hops"))
        )
        dist = (
            dist.unionByName(reached)
            .groupBy("node")
            .agg(F.min("hops").alias("hops"))
            # r15 (guide §3.3 / §2.4): truncate the lineage each round.
            # The union-fold references dist BOTH as the fold input and
            # (filtered) as the next broadcast frontier, so the chained
            # plan re-derived every earlier round inside each round's
            # broadcast build — 3-hop cost was ~3× a round, measured
            # 10.9 → 3.6 s at sf0.1 with the node-scale distance table
            # checkpointed per round. Values are exact integers under
            # min — materialization cannot move them.
            .localCheckpoint(eager=False)
        )
    return dist


@query(
    "graph_khop_reach",
    f"""
    WITH {_EDGES_CTE},
    srcs AS (SELECT src AS node FROM deg ORDER BY src LIMIT {KHOP_SOURCES}),
    d0 AS (SELECT node, 0 AS hops FROM srcs),
    {_khop_round_sql('d0', 'd1', 1)},
    {_khop_round_sql('d1', 'd2', 2)},
    {_khop_round_sql('d2', 'd3', 3)}
    SELECT node AS p_partkey, hops FROM d3
    """,
)
def graph_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (0..{KHOP_HOPS}) from the {KHOP_SOURCES} smallest
    part keys over the co-purchase graph. Fixed round count makes the
    whole BFS one chained plan, so the DuckDB oracle value-checks
    every round (the PageRank/LPA/k-core discipline); the sources are
    a deterministic ORDER BY src LIMIT n so both engines pick the
    same seed set. Reuses the session-cached edge materialization."""
    edges = _copurchase_edges(spark, sf_dir)
    sources = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .orderBy("node")
        .limit(KHOP_SOURCES)
    )
    return khop_distances(edges, sources, KHOP_HOPS).orderBy("node").select(
        F.col("node").alias("p_partkey"), "hops"
    )
