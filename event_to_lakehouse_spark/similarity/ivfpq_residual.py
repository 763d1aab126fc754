"""IVF-PQ with RESIDUAL encoding — the actual FAISS ``IVFxx,PQyy``
structure: PQ codes compress each vector's residual FROM its coarse
centroid, not the raw vector.

Why residuals matter at scale: after coarse assignment, vectors in a
cell share the cell's location — the raw-vector PQ codebook spends its
16 codes per subspace describing WHERE cells are, while a residual
codebook spends them describing the (much tighter) within-cell spread.
Same 6 bytes of index state per vector, strictly more resolution where
it counts; the cost is that the query-side LUT becomes per-(query,
probed-cell) — the query's residual differs in every cell it probes —
which multiplies LUT rows by n_probe but leaves them broadcast-sized.

Everything rides the proven integer micro grid: residuals are exact
double subtractions of identical cross-engine operands, subspace
distances snap to BIGINT micros at the moment they're computed, and
the oracle replays coarse assignment, residuals, the residual seed
codebook, codes, per-cell LUTs, ADC and the exact refine — every
intermediate value-checked, the ``ann_ivfpq_topk`` discipline with the
residual twist.

Reference parity: the reference has no vector tier (SURVEY §2
LLM-pipeline ABSENT-fill); the structure follows Jégou et al. 2011
(IVFADC) as implemented by FAISS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import query
from ..tables import load_tables
from .ann import _COS_SQL, CENT_STRIDE, N_PROBE
from .ivf_index import rank_against_centroids
from .pq import (
    PQ_K,
    PQ_M,
    PQ_NQ,
    PQ_SHORTLIST,
    PQ_SUB,
    PQ_TOPK,
    _d2_micro,
    _exact_rerank,
    pq_codebook,
    pq_encode,
)

__all__ = ["ann_ivfpq_residual_topk", "residual_frame"]

_RESID = (
    "zip_with(CAST({v} AS ARRAY<DOUBLE>), CAST({c} AS ARRAY<DOUBLE>),"
    " (x, y) -> x - y)"
)


def residual_frame(vectors: DataFrame, cent: DataFrame) -> DataFrame:
    """(vec_id, cell, embedding): each vector replaced by its residual
    from its assigned coarse centroid. The assignment is the certified
    ``rank_against_centroids`` cosine math; the subtraction is exact
    IEEE over operands both engines hold bit-identically, so every
    residual is cross-engine stable. One broadcast of the centroid
    frame; the corpus never shuffles."""
    assigned = rank_against_centroids(vectors, cent, 1).select(
        "vec_id", "embedding", F.col("cent_id").alias("cell")
    )
    return assigned.join(
        F.broadcast(cent.select(F.col("cent_id").alias("cell"), "c_emb")),
        "cell",
    ).select(
        "vec_id",
        "cell",
        F.expr(_RESID.format(v="embedding", c="c_emb")).alias("embedding"),
    )


def _sub_explode_keyed(df: DataFrame, keys: list[str]) -> DataFrame:
    """``pq._sub_explode`` with extra carried key columns (the residual
    query LUT is per probed CELL, so (query_id, cell) must survive the
    subspace explode)."""
    parts = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.slice(F.col("embedding"), j * PQ_SUB + 1, PQ_SUB).alias(
                    "sub"
                ),
            )
            for j in range(PQ_M)
        ]
    )
    return df.select(*keys, F.explode(parts).alias("s")).select(
        *keys, F.col("s.j").alias("j"), F.col("s.sub").alias("sub")
    )


def _residual_oracle(trained: bool = False) -> str:
    """``trained=True`` swaps the residual seed codebook for the full
    Lloyd chain TRAINED ON RESIDUALS (``_pq_trained_cent_ctes`` over
    the ``rsub`` CTE) — codebook, every iteration, codes, per-cell
    LUTs, ADC and refine all stay value-checked."""
    d2 = (
        "CAST(round((list_dot_product({a}, {a})"
        " - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b})) * 1000000) AS BIGINT)"
    )
    cos = _COS_SQL.format(a="e.embedding", b="c.cc_emb")
    resid = (
        "list_transform(list_zip(CAST({v} AS DOUBLE[]),"
        " CAST({c} AS DOUBLE[])), p -> p[1] - p[2])"
    )
    full = "CAST({e} AS DOUBLE[])"
    from .ivfpq import IVFPQ_MAX_CELLS

    stride = (
        f"SELECT greatest({CENT_STRIDE}, count(*) // {IVFPQ_MAX_CELLS})"
        " FROM embeddings"
    )
    if trained:
        from .pq import PQ_TRAIN_ITERS, _pq_trained_cent_ctes

        cent_block = _pq_trained_cent_ctes(PQ_TRAIN_ITERS, sub_cte="rsub")
    else:
        cent_block = f"""cent AS (
      SELECT vec_id AS cent_id, j, sub AS c_sub FROM rsub
      WHERE vec_id < {PQ_K}
    )"""
    return f"""
    WITH centc AS (
      SELECT vec_id AS cell, embedding AS cc_emb
      FROM embeddings WHERE vec_id % ({stride}) = 0
    ),
    affin AS (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round({cos}, 6) DESC, c.cell) AS crank
      FROM embeddings e CROSS JOIN centc c
    ),
    assigned AS (SELECT vec_id, cell FROM affin WHERE crank = 1),
    qcells AS (
      SELECT vec_id AS query_id, cell FROM affin
      WHERE vec_id < {PQ_NQ} AND crank <= {N_PROBE}
    ),
    resid AS (
      SELECT e.vec_id, a.cell,
             {resid.format(v="e.embedding", c="c.cc_emb")} AS remb
      FROM embeddings e
      JOIN assigned a ON a.vec_id = e.vec_id
      JOIN centc c ON c.cell = a.cell
    ),
    rsub AS (
      SELECT vec_id, cell, r.j AS j,
             remb[r.j * {PQ_SUB} + 1 : r.j * {PQ_SUB} + {PQ_SUB}] AS sub
      FROM resid, range(0, {PQ_M}) r(j)
    ),
    {cent_block},
    dmat AS (
      SELECT s.vec_id, s.j, c.cent_id,
             {d2.format(a="s.sub", b="c.c_sub")} AS d
      FROM rsub s JOIN cent c ON s.j = c.j
    ),
    codes AS (
      SELECT d.vec_id, a.cell, d.j, d.cent_id AS code FROM (
        SELECT vec_id, j, cent_id,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY d, cent_id) AS rn
        FROM dmat) d
      JOIN assigned a ON a.vec_id = d.vec_id
      WHERE d.rn = 1
    ),
    qres AS (
      SELECT q.query_id, q.cell,
             {resid.format(v="e.embedding", c="c.cc_emb")} AS remb
      FROM qcells q
      JOIN embeddings e ON e.vec_id = q.query_id
      JOIN centc c ON c.cell = q.cell
    ),
    qsub AS (
      SELECT query_id, cell, r.j AS j,
             remb[r.j * {PQ_SUB} + 1 : r.j * {PQ_SUB} + {PQ_SUB}] AS sub
      FROM qres, range(0, {PQ_M}) r(j)
    ),
    lut AS (
      SELECT s.query_id, s.cell, s.j, c.cent_id,
             {d2.format(a="s.sub", b="c.c_sub")} AS qd_micro
      FROM qsub s JOIN cent c ON s.j = c.j
    ),
    adc AS (
      SELECT l.query_id, co.vec_id,
             CAST(sum(l.qd_micro) AS BIGINT) AS adc_micro
      FROM codes co
      JOIN lut l ON l.cell = co.cell AND l.j = co.j
                AND l.cent_id = co.code
      WHERE co.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, vec_id, adc_micro,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_micro, vec_id) AS rank
      FROM adc
    ),
    short AS (
      SELECT query_id, vec_id FROM ranked WHERE rank <= {PQ_SHORTLIST}
    ),
    exact AS (
      SELECT s.query_id, s.vec_id,
             {d2.format(a=full.format(e="q.embedding"),
                        b=full.format(e="e.embedding"))} AS d_micro
      FROM short s
      JOIN embeddings e ON e.vec_id = s.vec_id
      JOIN embeddings q ON q.vec_id = s.query_id
    ),
    rr AS (
      SELECT query_id, vec_id, d_micro,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d_micro, vec_id) AS rank
      FROM exact
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
           round(d_micro / 1000000.0, 6) AS l2_dist
    FROM rr WHERE rank <= {PQ_TOPK}
    ORDER BY query_id, rank
    """


@query("ann_ivfpq_residual_topk", _residual_oracle())
def ann_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The residual-encoding IVFADC stack, every stage oracle-checked:

    1. coarse assignment (the certified IVF cosine math) picks each
       vector's cell; queries probe their ``N_PROBE`` cells;
    2. each vector is replaced by its RESIDUAL from its cell centroid
       and PQ-encoded against a residual-seed codebook — the codes
       describe within-cell spread, not cell location;
    3. ADC scores probed candidates via per-(query, cell) LUTs — the
       query's residual differs per probed cell, so the LUT carries
       the cell key (n_probe × PQ_M × PQ_K rows per query, still
       broadcast-sized);
    4. exact re-rank of the shortlist over RAW vectors (the refine
       stage never sees a residual).

    Scale shape matches ``ann_ivfpq_topk`` stage for stage — the
    corpus never shuffles (centroids, codebook and LUTs broadcast;
    codes carry cell keys for the probe-restriction join) — with one
    extra broadcast join to materialize residuals scan-side. The
    coarse stride is corpus-adaptive (``IVFPQ_MAX_CELLS`` bounded —
    the r10 rule; a fixed stride makes centroid count corpus-linear
    and assignment quadratic, which the 30× probe measured at 9.6×
    before this was applied)."""
    return _residual_pipeline(spark, sf_dir, trained=False)


@query("ann_ivfpq_residual_trained_topk", _residual_oracle(trained=True))
def ann_ivfpq_residual_trained_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The residual IVFADC stack with the codebook LLOYD-TRAINED ON
    RESIDUALS — the full production configuration (FAISS trains its
    IVFPQ codebooks on residuals by default): same four stages as
    ``ann_ivfpq_residual_topk``, but the codebook comes from
    ``pq_codebook_trained`` over the residual frame, and the oracle
    replays that training chain iteration by iteration (the
    ``_pq_trained_cent_ctes`` generator over the ``rsub`` CTE) before
    the serve stages. ``test_pq`` pins Lloyd's monotone-objective law
    on the residual frame (trained reconstruction error strictly below
    the seed init's); recall is NOT claimed here — this synthetic
    corpus is near-isotropic, so residuals carry no cluster structure
    for training to exploit (measured and disclosed in COVERAGE.md)."""
    return _residual_pipeline(spark, sf_dir, trained=True)


def _residual_pipeline(
    spark: SparkSession, sf_dir: str, trained: bool
) -> DataFrame:
    from ..functions.vectors import l2_norm
    from .ivfpq import IVFPQ_MAX_CELLS

    emb = load_tables(spark, sf_dir)["embeddings"].select(
        "vec_id", "embedding"
    )
    stride = max(CENT_STRIDE, emb.count() // IVFPQ_MAX_CELLS)
    cent = emb.filter(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm("embedding").alias("c_norm"),
    )
    resid = residual_frame(emb, cent)
    if trained:
        from .pq import PQ_TRAIN_ITERS, pq_codebook_trained

        cb = pq_codebook_trained(
            resid.select("vec_id", "embedding"), PQ_TRAIN_ITERS
        )
    else:
        cb = pq_codebook(resid.select("vec_id", "embedding"))
    codes = pq_encode(resid.select("vec_id", "embedding"), cb).join(
        resid.select("vec_id", "cell"), "vec_id"
    )
    queries = emb.filter(F.col("vec_id") < PQ_NQ)
    qcells = rank_against_centroids(queries, cent, N_PROBE).select(
        F.col("vec_id").alias("query_id"),
        "embedding",
        F.col("cent_id").alias("cell"),
    )
    qres = qcells.join(
        F.broadcast(cent.select(F.col("cent_id").alias("cell"), "c_emb")),
        "cell",
    ).select(
        "query_id",
        "cell",
        F.expr(_RESID.format(v="embedding", c="c_emb")).alias("embedding"),
    )
    qsub = _sub_explode_keyed(qres, ["query_id", "cell"])
    lut = qsub.join(F.broadcast(cb), "j").select(
        "query_id",
        "cell",
        "j",
        F.col("cent_id").alias("lut_cent"),
        _d2_micro(F.col("sub"), F.col("c_sub")).alias("qd_micro"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["cell", "j"])
        .filter(
            (F.col("code") == F.col("lut_cent"))
            & (F.col("vec_id") != F.col("query_id"))
        )
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd_micro").alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_micro", "vec_id")
    short = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_SHORTLIST)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(emb, short, queries, PQ_TOPK).orderBy(
        "query_id", "rank"
    )
