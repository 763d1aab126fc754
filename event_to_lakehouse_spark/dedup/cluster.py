"""Duplicate-cluster labeling: connected components of the near-dup
pair graph.

Pairwise similarity (jaccard/minhash/simhash modules) yields EDGES;
deduplication needs COMPONENTS — "these 5 docs are all one document,
keep exactly one". This operator assigns every paired doc a cluster id
(the min doc_id in its component) via Pregel-style min-label
propagation expressed with plain joins/aggregations:

    label(v) ← min(label(v), min over neighbors' labels)

iterated to fixpoint. Convergence needs diameter(component) rounds —
near-dup clusters are shallow (a handful of rounds); ``max_iter``
bounds pathological chains. Each round is one equi-join + one
hash-agg, both partitioned on vertex id; the only driver-side value is
the scalar converged-count (never data). Intermediates are persisted:
each round's DAG would otherwise re-derive every prior round.

Each round fuses min-propagation with one POINTER JUMP
(``label(v) ← label(label(v))``): label values are always vertex ids
within the component, so composing the labeling with itself is safe
and doubles the effective hop distance per round — chains converge in
O(log diameter) rounds instead of O(diameter). The convergence probe
is free of extra joins: the round computes its own ``changed`` flag
(new label < old) and the probe is an ``isEmpty`` scan of a
checkpointed leaf. At a combined-round fixpoint both constituent steps
are fixed (each is monotone non-increasing), and a propagation
fixpoint means labels are equal across every edge — constant per
component, i.e. converged.

Because typical near-dup graphs converge in 2-3 rounds, FIXED per-round
cost dominates; the loop therefore folds round 1 into a bare
groupBy(min) on the symmetric edges (identity initial labels need no
join and the vertex set is the dst values), never probes round 1 (any
edge guarantees a round-1 change), and checkpoints/probes only every
second round so two rounds of joins execute as ONE Spark job with a
lineage depth of at most two rounds.

The DuckDB oracle computes the same fixpoint with a recursive CTE over
the SAME pair SQL (composed from the registered jaccard oracle), so
the whole chain — shingles → blocked pairs → transitive closure — is
verified end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import ORACLES, query
from ..tables import load_tables
from .jaccard import dedup_ngram_jaccard

MAX_ITER = 20

#: Edge-count gate for the driver-local union-find path. 2M edges ≈
#: 32 MB of longs — trivially driver-sized, and near-dup pair graphs
#: are a vanishing fraction of the corpus (sf0.1: ~1k edges from 500k
#: docs), so even a 100 TB corpus usually lands under this. Above the
#: gate the distributed pointer-jump loop runs; the gate only ever
#: sees a number the edges job already produced (a leaf count).
SMALL_GRAPH_EDGES = 2_000_000


def _unionfind_labels(edge_rows) -> list[tuple]:
    """Driver-local connected components with min-id roots: union by
    smaller-root-wins keeps each set's root equal to its minimum vertex
    id, so labels match the distributed fixpoint exactly."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    vertices = set()
    for src, dst in edge_rows:
        vertices.add(src)
        vertices.add(dst)
        ra, rb = find(src), find(dst)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return [(v, find(v)) for v in sorted(vertices)]


def cluster_labels(
    pairs: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = MAX_ITER,
    small_graph_edges: int = SMALL_GRAPH_EDGES,
) -> DataFrame:
    """(doc_id, cluster_id) for every vertex of the pair graph;
    cluster_id = min doc_id in the connected component.

    SIZE-ADAPTIVE like real graph engines: the (already materialized)
    edge count picks between a driver-local union-find for graphs that
    are metadata-scale anyway (collect is bounded by
    ``small_graph_edges``; pass 0 to forbid) and the distributed
    min-propagation + pointer-jump loop for graphs that aren't. Both
    produce identical labels (pytest-pinned); the iterative path's
    per-round shape is described in the module docstring."""
    # localCheckpoint, not persist: persist caches DATA but every round
    # still carries the full upstream LOGICAL plan, and Catalyst
    # re-analyzes it per action — with a literal-heavy pair source
    # (LSH hyperplane expressions) the analysis alone cost 10+ s per
    # loop while the 100-row joins took milliseconds. Truncating the
    # lineage at the loop boundary (the standard iterative-algorithm
    # pattern — GraphX checkpoints for exactly this reason) makes each
    # round's plan O(1) regardless of how the edges were derived.
    # Symmetrize with ONE pass over the pair pipeline: explode each
    # pair into both directions. The union-of-two-projections form
    # executed the (expensive) upstream pair derivation twice per
    # materialization — measured 0.3 s slower at sf0.1. No distinct:
    # every upstream pair source emits distinct (a,b) pairs already,
    # and duplicates would be harmless anyway (both the min-aggregation
    # rounds and union-find are duplicate-insensitive) — dropping it
    # makes edge materialization a MAP-ONLY job, no shuffle.
    edges = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col(a).alias("src"), F.col(b).alias("dst")),
                F.struct(F.col(b).alias("src"), F.col(a).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # localCheckpoint (NOT persist) to materialize: caching the plan
    # would pin the pair pipeline's physical plan outside AQE —
    # measured 2.5→7 s at sf0.1 when the upstream joins lost their
    # runtime broadcast/coalesce re-planning.
    edges = edges.localCheckpoint()
    if small_graph_edges:
        # ONE probe job on the leaf: limit(gate+1) + Arrow transfer
        # decides the gate AND (when small) delivers the edges — a
        # separate count job costs another round of scheduling, and
        # even the over-limit discard is bounded (gate+1 rows of two
        # ints ≈ 32 MB through Arrow).
        import pandas as pd
        from pyspark.sql import types as T

        probe = edges.limit(small_graph_edges + 1).toPandas()
        if len(probe) <= small_graph_edges:
            # The graph is driver-trivial: the whole fixpoint is one
            # local union-find instead of N Spark jobs of tiny joins
            # (measured 0.7 s/pair-of-rounds of pure scheduling
            # overhead at sf0.1 for a 1k-edge graph). Result returns
            # as an Arrow-built local relation (no parallelize tasks).
            id_type = edges.schema["src"].dataType
            rows = _unionfind_labels(
                zip(probe["src"].tolist(), probe["dst"].tolist())
            )
            return edges.sparkSession.createDataFrame(
                pd.DataFrame(rows, columns=["doc_id", "cluster_id"]),
                T.StructType(
                    [
                        T.StructField("doc_id", id_type),
                        T.StructField("cluster_id", id_type),
                    ]
                ),
            )

    # The graphs this operator sees converge in a few rounds, so FIXED
    # cost per round (job launch + checkpoint materialization) is the
    # cost — three levers attack it (VERDICT r4):
    #  * round 1 is FOLDED: with identity initial labels, neighbor-min
    #    is just min(src) per dst and the vertex set IS the dst values
    #    (edges are symmetrized) — no distinct, no left join.
    #  * round 1 is never probed: any edge forces a label change in
    #    round 1 (each edge's larger endpoint adopts the smaller id),
    #    so the probe could only succeed on an empty graph — which the
    #    round-2 probe catches for free.
    #  * checkpoint + probe every SECOND round only: an odd round stays
    #    a lazy plan and executes inside the next round's job, halving
    #    jobs/materializations (lineage depth 2 keeps analysis O(1)).
    labels = None
    new_labels = None
    for r in range(1, max_iter + 1):
        if labels is None:
            prop = (
                edges.groupBy("dst")
                .agg(F.min("src").alias("nbr_label"))
                .select(
                    F.col("dst").alias("id"),
                    F.least(F.col("dst"), F.col("nbr_label")).alias("prop"),
                    F.col("dst").alias("old"),
                )
            )
        else:
            nbr_min = (
                edges.join(labels, edges.src == labels.id)
                .groupBy("dst")
                .agg(F.min("label").alias("nbr_label"))
            )
            prop = labels.join(nbr_min, labels.id == nbr_min.dst, "left").select(
                "id",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("prop"),
                F.col("label").alias("old"),
            )
        # pointer jump: follow the propagated label to ITS label. Label
        # values are vertex ids, so the lookup side is prop itself.
        lk = prop.select(
            F.col("id").alias("jid"), F.col("prop").alias("jlabel")
        )
        new_labels = prop.join(lk, prop.prop == lk.jid, "left").select(
            "id",
            F.least(F.coalesce("jlabel", "prop"), F.col("prop")).alias("label"),
            (F.least(F.coalesce("jlabel", "prop"), F.col("prop")) < F.col("old"))
            .alias("changed"),
        )
        if r % 2 == 0 or r == max_iter:
            new_labels = new_labels.localCheckpoint()  # the pair's one job
            labels = new_labels.select("id", "label")
            # Probe on the checkpointed leaf: no join, no shuffle — a
            # local scan that stops at the first changed row. A no-op
            # odd round inside this pair is harmless: its joins are
            # label-preserving, and the probe still sees this round's
            # changed flag.
            if new_labels.filter("changed").isEmpty():
                break
        else:
            labels = new_labels.select("id", "label")
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def _oracle() -> str:
    pair_sql = ORACLES["dedup_ngram_jaccard"]
    return f"""
    WITH RECURSIVE
    pairs AS ({pair_sql}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT src AS id, dst AS r FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT id AS doc_id, least(id, min(r)) AS cluster_id
    FROM reach GROUP BY id
    """


@query("dedup_cluster_labels", _oracle())
def dedup_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster ids over the exact-Jaccard near-dup graph."""
    load_tables(spark, sf_dir)
    return cluster_labels(dedup_ngram_jaccard(spark, sf_dir))


def _semantic_oracle() -> str:
    """Transitive closure over the EMBEDDING near-dup pair SQL, then a
    quality-ranked survivor per component — the full semantic-dedup
    chain (LSH blocking → cosine pairs → components → survivor pick)
    verified by ONE recursive-CTE oracle."""
    # importing ann registers the near-dup entry (no import cycle:
    # similarity never imports dedup)
    from ..similarity import ann  # noqa: F401

    pair_sql = ORACLES["dedup_embedding_neardup"]
    return f"""
    WITH RECURSIVE
    pairs AS ({pair_sql}),
    edges AS (
      SELECT vec_id_a AS src, vec_id_b AS dst FROM pairs
      UNION
      SELECT vec_id_b, vec_id_a FROM pairs
    ),
    reach AS (
      SELECT src AS id, dst AS r FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    labels AS (
      SELECT id AS doc_id, least(id, min(r)) AS cluster_id
      FROM reach GROUP BY id
    )
    SELECT l.doc_id, l.cluster_id,
           (row_number() OVER (
              PARTITION BY l.cluster_id
              ORDER BY d.n_chars DESC, l.doc_id ASC) = 1) AS is_survivor
    FROM labels l JOIN documents d ON l.doc_id = d.doc_id
    """


@query("dedup_semantic", _semantic_oracle())
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC dedup end-to-end: embedding near-dup pairs (banded LSH
    blocking, exact cosine) → connected components → keep the best
    document per component (longest text wins, min doc_id tiebreak —
    the survivor policy a curation pipeline applies before training).

    Scale shape: reuses the near-dup plan (narrow candidate shuffle,
    persisted block keys) and the bounded Pregel loop; the survivor
    rank is one window over the LABELED rows only — near-dup clusters
    are a tiny fraction of the corpus, so the documents join probes
    with a small build side rather than shuffling the full table."""
    from pyspark.sql.window import Window

    from ..similarity.ann import dedup_embedding_neardup

    t = load_tables(spark, sf_dir)
    pairs = dedup_embedding_neardup(spark, sf_dir)
    labels = cluster_labels(pairs, a="vec_id_a", b="vec_id_b")
    docs = t["documents"].select("doc_id", "n_chars")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return (
        F.broadcast(labels)  # labeled rows ≪ corpus: docs never shuffle
        .join(docs, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            (F.col("rn") == 1).alias("is_survivor"),
        )
    )


def _stats_oracle() -> str:
    """Size histogram over the SAME recursive-CTE clustering the
    ``dedup_cluster_labels`` oracle certifies, plus the singleton row
    (documents touching no near-dup edge)."""
    pair_sql = ORACLES["dedup_ngram_jaccard"]
    return f"""
    WITH RECURSIVE
    pairs AS ({pair_sql}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT src AS id, dst AS r FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    ),
    labels AS (
      SELECT id AS doc_id, least(id, min(r)) AS cluster_id
      FROM reach GROUP BY id
    ),
    sizes AS (SELECT cluster_id, count(*) AS sz FROM labels GROUP BY 1),
    hist AS (
      SELECT CAST(sz AS BIGINT) AS cluster_size,
             CAST(count(*) AS BIGINT) AS n_clusters,
             CAST(sum(sz) AS BIGINT) AS n_docs
      FROM sizes GROUP BY 1
    ),
    single AS (
      SELECT CAST(1 AS BIGINT) AS cluster_size,
             CAST((SELECT count(*) FROM documents)
                  - (SELECT count(*) FROM labels) AS BIGINT) AS n_clusters,
             CAST((SELECT count(*) FROM documents)
                  - (SELECT count(*) FROM labels) AS BIGINT) AS n_docs
    )
    SELECT cluster_size, n_clusters, n_docs,
           n_docs - n_clusters AS excess_docs
    FROM (SELECT * FROM hist UNION ALL SELECT * FROM single)
    """


@query("dedup_cluster_stats", _stats_oracle())
def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram of the near-dup graph — the dedup
    QUALITY report a curation run reads before committing a survivor
    pass: how many clusters at each size, how many documents they
    hold, and the excess (``n_docs - n_clusters`` — exactly the rows a
    survivor pass would drop). The singleton row (size 1) counts
    documents touching no near-dup edge, so ``sum(n_docs)`` equals the
    corpus and ``sum(excess_docs) / corpus`` is the duplicate rate.

    Shape: the already-certified clustering (one CC pass over the
    pair graph) followed by two key-cardinality rollups — the stats
    add nothing fact-sized. Exact integers end to end.
    """
    docs = load_tables(spark, sf_dir)["documents"]
    labels = dedup_cluster_labels(spark, sf_dir)
    sizes = labels.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    hist = sizes.groupBy(F.col("sz").cast("long").alias("cluster_size")).agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("sz").cast("long").alias("n_docs"),
    )
    n_total = docs.select(F.count("*").alias("n")).withColumn("j", F.lit(1))
    n_labeled = labels.select(F.count("*").alias("m")).withColumn("j", F.lit(1))
    single = (
        n_total.join(n_labeled, "j")
        .select(
            F.lit(1).cast("long").alias("cluster_size"),
            (F.col("n") - F.col("m")).cast("long").alias("n_clusters"),
            (F.col("n") - F.col("m")).cast("long").alias("n_docs"),
        )
    )
    return hist.unionByName(single).select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        (F.col("n_docs") - F.col("n_clusters")).alias("excess_docs"),
    )
