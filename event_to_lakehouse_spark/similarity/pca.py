"""Distributed PCA (top principal component) by exact Gram matrix +
power iteration — the embedding-quality primitive a training pipeline
runs to find the dominant variance direction (anisotropy check,
whitening input, drift axis).

Why this decomposition fits Spark: the ONLY data-sized pass is the
covariance accumulation — (dim × dim) integer sufficient statistics
with map-side partial aggregation — after which the eigen-iteration
runs over a dim²-row frame (64² = 4096 cells here) that never grows
with the corpus. This is the textbook "sufficient statistics then
driver-scale solve" split: the corpus pass is one Catalyst plan, the
solve runs on the driver over the collected metadata-scale statistics
(the r15 optimization; the solve was previously chained declaratively,
which cost ~220 corpus-independent stages of pure scheduling — see
``emb_pca_power_iteration``'s docstring), and the DuckDB oracle still
replays the whole computation declaratively.

Exactness discipline: embeddings quantize to the 1e-6 integer grid
first (the ``pq_codebook_trained`` convention), so Σq_i and Σq_i·q_j
are exact BIGINTs — order-independent, bit-identical cross-engine.
The centered covariance C = (Σq_iq_j − Σq_i·Σq_j/n)/(n·10¹²) and the
power iterations are then fixed IEEE expression trees over those
exact integers; the one nondeterminism class left (64-term double
sums inside the iteration aggs) is ulp-scale and absorbed by
round(6)/round(4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.relational import query
from ..tables import load_tables
from .ann import EMB_DIM

PCA_ITERS = 3  # normalized power-iteration rounds before the Rayleigh step
_Q = 1_000_000  # micro-grid
_V0 = 0.125  # 1/sqrt(64): uniform unit start vector


def _pca_oracle() -> str:
    it_prev = "it0"
    iter_ctes = []
    for t in range(1, PCA_ITERS + 1):
        iter_ctes.append(
            f"""
    w{t} AS (
        SELECT c.i, sum(c.c * v.v) AS w
        FROM cov c JOIN {it_prev} v ON c.j = v.i GROUP BY c.i
    ),
    n{t} AS (SELECT sqrt(sum(w * w)) AS nrm FROM w{t}),
    it{t} AS (SELECT i, w / nrm AS v FROM w{t}, n{t})"""
        )
        it_prev = f"it{t}"
    iters = ",".join(iter_ctes)
    return f"""
    WITH cells AS (
        SELECT vec_id, r.d - 1 AS i,
               CAST(round(CAST(embedding[r.d] AS DOUBLE) * {_Q}) AS BIGINT)
                 AS q
        FROM embeddings CROSS JOIN range(1, {EMB_DIM + 1}) r(d)
    ),
    sq AS (
        SELECT i, CAST(sum(q) AS BIGINT) AS s,
               CAST(count(*) AS BIGINT) AS n
        FROM cells GROUP BY i
    ),
    sqq AS (
        SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS ss
        FROM cells a JOIN cells b ON a.vec_id = b.vec_id
        GROUP BY a.i, b.i
    ),
    cov AS (
        SELECT p.i, p.j,
               (CAST(p.ss AS DOUBLE)
                - CAST(si.s AS DOUBLE) * sj.s / si.n)
                 / (CAST(si.n AS DOUBLE) * {_Q}.0 * {_Q}.0) AS c
        FROM sqq p JOIN sq si ON p.i = si.i JOIN sq sj ON p.j = sj.i
    ),
    it0 AS (SELECT i, {_V0} AS v FROM sq),{iters},
    ray AS (
        SELECT c.i, sum(c.c * v.v) AS w
        FROM cov c JOIN it{PCA_ITERS} v ON c.j = v.i GROUP BY c.i
    ),
    lam AS (
        SELECT sum(r.w * v.v) AS eigval
        FROM ray r JOIN it{PCA_ITERS} v ON r.i = v.i
    )
    SELECT CAST(v.i AS BIGINT) AS dim,
           round(v.v, 6) AS loading,
           round(lam.eigval, 4) AS eigval,
           (SELECT CAST(max(n) AS BIGINT) FROM sq) AS n_vecs
    FROM it{PCA_ITERS} v, lam
    """


@query("emb_pca_power_iteration", _pca_oracle())
def emb_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding table: exact integer
    Gram/covariance accumulation in ONE corpus pass, then {PCA_ITERS}
    normalized power iterations and a Rayleigh-quotient eigenvalue
    solved over the dim²-row sufficient statistics ON THE DRIVER
    (module docstring has the full exactness story).

    r15 optimization (guide §1.2 step 1 + §3.3): the previous fully-
    declarative version touched the corpus twice (dim-sums, then full
    dim² pair products) and chained the corpus-independent iterations
    as nested broadcast joins — a 10,691-line physical plan whose
    ~220 stages were pure scheduling overhead (measured 5.5-6.2 s at
    sf0.1 where the two corpus aggregations account for well under a
    second). Now:

    - ONE pass: the JVM-quantized integer vectors cross the Arrow
      boundary once per task and NumPy accumulates X^T·X + Σq + n as
      int64 per-task partials (guide §4.2 — the codegen HOF pair
      expansion allocated dim² structs per row; the matmul does the
      same exact integer arithmetic in vectorized native code). Each
      task emits ≤ dim²+dim partial rows; the single groupBy shuffles
      only those — the corpus never shuffles.
    - The collected statistics are dim²-bounded (dim²+dim = 4,160
      integer rows at EMB_DIM=64 —
      metadata-scale at ANY corpus size; guide §5's driver rule), and
      the covariance cell formula is the SAME IEEE expression
      (ss − si·sj/n)/(n·10¹²) the declarative plan evaluated, so the
      driver solve is bit-identical per cell; iteration double-sums
      were already only round(6)/round(4)-stable across engines (see
      module docstring), which the NumPy solve preserves.
    - Final rounding still happens IN SPARK over the 64-row result
      frame, so the decimal-rounding semantics the oracle hash is
      built on are untouched.

    Start vector is the uniform unit vector (deterministic, so the
    converged SIGN is identical cross-engine — no sign-fixing rule
    needed). At 10⁹ vectors the same shape holds: only the one integer
    accumulation sees the data; the solve stays dim²."""
    import numpy as np

    emb = load_tables(spark, sf_dir)["embeddings"]
    qvec = emb.select(
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>),"
            f" x -> CAST(round(x * {_Q}) AS BIGINT))"
        ).alias("q")
    )
    # Gram partials per TASK via Arrow batches + NumPy int64 matmul
    # (guide §4.2: hand whole batches to vectorized native code — the
    # codegen HOF pair expansion allocated dim² structs per row and
    # measured 2.9 s at sf0.1 where X^T·X over the same integers is
    # milliseconds). Each task emits ≤ dim²+dim integer partial rows
    # ((i, j, partial sum) cells plus (i, -1, Σq_i, row-count)
    # sentinels); the downstream groupBy shuffles only those — the
    # corpus itself never shuffles, exactly as before. int64 products
    # carry the same overflow headroom as the previous JVM sum.
    def _gram(batches):
        import numpy as np
        import pyarrow as pa

        dim = EMB_DIM
        sv = np.zeros(dim, dtype=np.int64)
        gm = np.zeros((dim, dim), dtype=np.int64)
        n_rows = 0
        for b in batches:
            col = b.column(0)
            flat_arr = col.flatten()
            # Fail LOUDLY on malformed embeddings (ADVICE r15): a null
            # element would become NaN → INT64_MIN under the asarray
            # cast (numpy warns, doesn't raise) and silently corrupt
            # the Gram sums; a null/ragged row misaligns the reshape.
            # The declarative plan null-propagated these away — this
            # path must never differ silently.
            if (
                col.null_count
                or flat_arr.null_count
                or len(flat_arr) != len(col) * dim
            ):
                raise ValueError(
                    "pca gram pass: null or ragged embedding row "
                    f"(list nulls={col.null_count}, "
                    f"element nulls={flat_arr.null_count}, "
                    f"values={len(flat_arr)} for {len(col)} rows of dim {dim})"
                )
            flat = flat_arr.to_numpy(zero_copy_only=False)
            x = np.asarray(flat, dtype=np.int64).reshape(-1, dim)
            n_rows += x.shape[0]
            sv += x.sum(axis=0)
            gm += x.T @ x
        if n_rows == 0:
            return
        ii = np.repeat(np.arange(dim), dim)
        jj = np.tile(np.arange(dim), dim)
        yield pa.record_batch(
            [
                pa.array(
                    np.concatenate([ii, np.arange(dim)]), type=pa.int32()
                ),
                pa.array(
                    np.concatenate([jj, np.full(dim, -1)]), type=pa.int32()
                ),
                pa.array(
                    np.concatenate([gm[ii, jj], sv]), type=pa.int64()
                ),
                pa.array(
                    np.concatenate(
                        [np.zeros(dim * dim, np.int64), np.full(dim, n_rows)]
                    ),
                    type=pa.int64(),
                ),
            ],
            names=["i", "j", "s", "cnt"],
        )

    stats = (
        qvec.mapInArrow(_gram, "i int, j int, s long, cnt long")
        .groupBy("i", "j")
        .agg(
            F.sum("s").cast("long").alias("s"),
            F.sum("cnt").cast("long").alias("cnt"),
        )
        .collect()
    )
    s = np.zeros(EMB_DIM, dtype=np.int64)
    ss = np.zeros((EMB_DIM, EMB_DIM), dtype=np.int64)
    n = 0
    for r in stats:
        if r["j"] == -1:
            s[r["i"]] = r["s"]
            n = max(n, r["cnt"])
        else:
            ss[r["i"], r["j"]] = r["s"]
    nf = float(n)
    sd = s.astype(np.float64)
    # per-cell: (ss − si·sj/n) / ((n·Q)·Q) — operand order exactly as
    # the declarative plan's expression tree, so each cell is the same
    # IEEE double the old plan produced
    cov = (ss.astype(np.float64) - np.outer(sd, sd) / nf) / (
        nf * float(_Q) * float(_Q)
    )
    v = np.full(EMB_DIM, _V0, dtype=np.float64)
    for _ in range(PCA_ITERS):
        w = cov @ v
        v = w / np.sqrt(float((w * w).sum()))
    lam = float((cov @ v) @ v)
    out = spark.createDataFrame(
        [(int(i), float(v[i]), lam, int(n)) for i in range(EMB_DIM)],
        "dim long, loading double, eigval double, n_vecs long",
    )
    return out.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("eigval", 4).alias("eigval"),
        "n_vecs",
    )
