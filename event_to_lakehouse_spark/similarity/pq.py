"""Product quantization (PQ) with asymmetric-distance (ADC) top-k.

The missing tier of the vector story: brute force is exact but carries
the full vectors, IVF prunes WHICH vectors are scored, and PQ
compresses HOW each scored vector is represented — the corpus scan
carries ``PQ_M`` small codes per vector (4 bytes here) instead of the
64-float embedding, a 64× memory cut, which is what makes
billion-vector search fit in RAM (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011; the FAISS IVF+PQ default).

Spark shape, all codegen + broadcast:

- **codebook**: the embedding splits into ``PQ_M`` = 4 subspaces of 16
  dims; each subspace's ``PQ_K`` = 16 centroids are the seed vectors'
  subvectors (``vec_id < PQ_K`` — the deterministic-init convention of
  ``ann_kmeans_step``, whose Lloyd iteration refines codebooks the same
  way it refines IVF centroids; one step suffices for the parity gauge).
- **encode**: explode each vector into its 4 subvectors, broadcast-join
  the 64-row codebook, per-(vector, subspace) argmin via a struct-min
  (map-side partial agg; tiebreak = centroid id) → 4 small codes/vector.
- **ADC**: per query, a 64-entry lookup table of subspace distances is
  built against the codebook and BROADCAST; scoring the corpus is a
  broadcast join on (subspace, code) + a 4-row integer sum per
  (query, vector) — the corpus embeddings are never touched again.

Determinism discipline: every subspace distance lands on the integer
MICRO grid (``round(d² × 1e6)`` as BIGINT) the moment it is computed —
the argmin ordering and the 4-term ADC sums are then exact integer
arithmetic, immune to the float-summation-order ulps that round(…, n)
of a double aggregate would expose (the events_twap lesson applied to
vector search). The one remaining double step — the dot products —
rides the proven ``functions.vectors.dot`` ↔ ``list_dot_product``
parity pair.

At 100 TB: codes are 16 bits/vector here (4 × 4-bit-capable codes
stored as ints); the ADC scan reads only (vec_id, j, code) — column-
pruned parquet — and the per-query state is a 64-int broadcast LUT. In
production this composes with IVF (score only probed cells) exactly as
FAISS does; the exhaustive scan here is the oracle-checkable core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import dot
from ..operators.relational import query
from ..tables import load_tables

PQ_M = 4  # subspaces
PQ_SUB = 16  # dims per subspace (4 × 16 = the 64-dim embedding)
PQ_K = 16  # centroids per subspace (codes fit in 4 bits)
PQ_NQ = 5  # fixed query set: vec_id < 5 (the ann family convention)
PQ_TOPK = 10
PQ_SHORTLIST = 100  # ADC shortlist width for the exact re-rank stage


def _sub_explode(df: DataFrame, id_alias: str) -> DataFrame:
    """(id, j, sub): the vector split into its PQ_M subvectors —
    one explode over a literal array, no shuffle."""
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
    return df.select(
        F.col("vec_id").alias(id_alias), F.explode(parts).alias("s")
    ).select(id_alias, F.col("s.j").alias("j"), F.col("s.sub").alias("sub"))


def _d2_micro(a, b) -> F.Column:
    """Squared L2 on the integer micro grid: ||a||² − 2a·b + ||b||²,
    each dot on the proven parity pair, the result snapped to
    round(d² × 1e6) as BIGINT so downstream ordering and summation are
    exact integer arithmetic."""
    d2 = dot(a, a) - 2 * dot(a, b) + dot(b, b)
    return F.round(d2 * F.lit(1_000_000.0)).cast("long")


def pq_codebook(emb: DataFrame) -> DataFrame:
    """(cent_id, j, c_sub): PQ_K × PQ_M subvector centroids from the
    deterministic seed rows."""
    return (
        _sub_explode(emb.filter(F.col("vec_id") < PQ_K), "cent_id")
        .withColumnRenamed("sub", "c_sub")
    )


def pq_encode(emb: DataFrame, codebook: DataFrame) -> DataFrame:
    """(vec_id, j, code): per-subspace argmin centroid. One broadcast
    join + one struct-min groupBy (map-side partials; ties break to the
    smaller cent_id via the struct order)."""
    paired = _sub_explode(emb, "vec_id").join(F.broadcast(codebook), "j")
    return (
        paired.groupBy("vec_id", "j")
        .agg(
            F.min(
                F.struct(
                    _d2_micro(F.col("sub"), F.col("c_sub")).alias("d"),
                    F.col("cent_id"),
                )
            ).alias("m")
        )
        .select("vec_id", "j", F.col("m.cent_id").alias("code"))
    )


def pq_adc_topk(
    emb: DataFrame, codes: DataFrame, codebook: DataFrame, k: int = PQ_TOPK
) -> DataFrame:
    """Asymmetric-distance top-k over the gauge query set (the fixed
    ``vec_id < PQ_NQ`` convention): per-query LUT of subspace distances
    (query subvector × codebook, PQ_M·PQ_K rows/query) broadcast
    against the codes scan; approx distance = exact integer sum of the
    PQ_M looked-up micro distances."""
    return pq_adc_topk_with_queries(
        emb.filter(F.col("vec_id") < PQ_NQ), codes, codebook, k=k
    )


def pq_rerank_topk(
    emb: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    shortlist: int = PQ_SHORTLIST,
    k: int = PQ_TOPK,
) -> DataFrame:
    """The production composition (FAISS's IVF-PQ + refine): the cheap
    compressed scan nominates a ``shortlist`` per query, then ONLY
    those rows' full vectors are read back for an exact-distance
    re-rank — final top-k is exactly ordered within the shortlist, so
    end-to-end recall equals shortlist recall (≈ 0.6 at the 2%
    shortlist here; pytest-pinned with a safe floor) while the full-
    vector work drops from |corpus| to |shortlist| per query."""
    return pq_rerank_topk_with_queries(
        emb,
        codes,
        codebook,
        emb.filter(F.col("vec_id") < PQ_NQ),
        shortlist=shortlist,
        k=k,
    )


class PQIndex:
    """DURABLE PQ index — the compressed-codes member of the durable-
    index family (``NearDupIndex`` / ``ExactDedupIndex`` / ``IVFIndex``
    / ``BloomIndex``).

    Two SnapshotTables under ``root``: ``codebook`` (written once, the
    PQ_M×PQ_K subvector centroids — re-encoding batches against a
    MOVING codebook would silently mix incomparable codes, so the
    codebook is pinned at creation) and ``codes`` (one append per
    batch, ``batch_token`` exactly-once). ``add_batch`` encodes ONLY
    the arriving vectors (batch-cost-only, like ``IVFIndex.add_batch``);
    ``topk`` serves ADC + exact re-rank against the stored codes with
    the query set broadcast — held embeddings are re-read only for the
    per-query shortlist rows, never scanned wholesale.
    """

    def __init__(self, spark: SparkSession, root: str):
        from ..storage.snapshots import SnapshotTable

        self.spark = spark
        self.codebook_table = SnapshotTable(spark, f"{root}/codebook")
        self.codes_table = SnapshotTable(spark, f"{root}/codes")

    def _codebook(self) -> DataFrame | None:
        try:
            return self.codebook_table.read()
        except FileNotFoundError:
            return None

    def add_batch(
        self, emb: DataFrame, batch_token: str | None = None
    ):
        """Encode the batch against the pinned codebook (trained from
        the FIRST batch's seed rows) and append its codes."""
        cb = self._codebook()
        if cb is None:
            self.codebook_table.append(pq_codebook(emb))
            cb = self.codebook_table.read()
        snap = self.codes_table.snapshot()
        if (
            batch_token is not None
            and snap is not None
            and batch_token in snap.batch_tokens
        ):
            return snap  # replay: codes already held
        return self.codes_table.append(
            pq_encode(emb, cb), batch_token=batch_token
        )

    def topk(
        self,
        emb: DataFrame,
        queries: DataFrame,
        shortlist: int = PQ_SHORTLIST,
        k: int = PQ_TOPK,
    ) -> DataFrame:
        """ADC shortlist over the STORED codes + exact re-rank.
        ``emb`` supplies full vectors for the shortlist re-read and the
        query vectors; equivalence with the one-shot batch pipeline
        over everything ever added is pytest-pinned."""
        return pq_rerank_topk_with_queries(
            emb,
            self.codes_table.read(),
            self._codebook(),
            queries,
            shortlist=shortlist,
            k=k,
        )

    def vec_count(self) -> int:
        """Vectors held (codes rows / PQ_M) — metadata-scale."""
        try:
            return self.codes_table.read().count() // PQ_M
        except FileNotFoundError:
            return 0


def pq_adc_topk_with_queries(
    emb_queries: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    k: int = PQ_TOPK,
) -> DataFrame:
    """ADC top-k for an explicit query frame (vec_id, embedding) —
    the general form ``pq_adc_topk`` specializes with the fixed
    ``vec_id < PQ_NQ`` gauge set."""
    qsub = _sub_explode(emb_queries, "query_id")
    lut = qsub.join(F.broadcast(codebook), "j").select(
        "query_id",
        "j",
        "cent_id",
        _d2_micro(F.col("sub"), F.col("c_sub")).alias("qd_micro"),
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["j"] == lut["j"]) & (codes["code"] == lut["cent_id"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd_micro").alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_micro", "vec_id")
    return (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            F.round(F.col("adc_micro") / 1_000_000.0, 6).alias("adc_dist"),
        )
    )


def _exact_rerank(
    emb: DataFrame, short: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """Exact-L2 re-rank of a (query_id, vec_id) shortlist: full vectors
    are re-read for the shortlist rows ONLY (both join sides broadcast
    against one emb scan), then ranked on the integer micro grid."""
    qv = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    exact = (
        emb.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "vec_id",
            _d2_micro(F.col("q_emb"), F.col("embedding")).alias("d_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy("d_micro", "vec_id")
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("int").alias("rank"),
            "vec_id",
            F.round(F.col("d_micro") / 1_000_000.0, 6).alias("l2_dist"),
        )
    )


def pq_rerank_topk_with_queries(
    emb: DataFrame,
    codes: DataFrame,
    codebook: DataFrame,
    queries: DataFrame,
    shortlist: int = PQ_SHORTLIST,
    k: int = PQ_TOPK,
) -> DataFrame:
    """Shortlist + exact re-rank for an explicit query frame."""
    short = pq_adc_topk_with_queries(
        queries, codes, codebook, k=shortlist
    ).select("query_id", "vec_id")
    return _exact_rerank(emb, short, queries, k)


def _pq_oracle() -> str:
    d2 = (
        "CAST(round((list_dot_product({a}, {a})"
        " - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b})) * 1000000) AS BIGINT)"
    )
    return f"""
    WITH sub AS (
      SELECT vec_id, r.j AS j,
             CAST(embedding[r.j * {PQ_SUB} + 1 : r.j * {PQ_SUB} + {PQ_SUB}]
                  AS DOUBLE[]) AS sub
      FROM embeddings, range(0, {PQ_M}) r(j)
    ),
    cent AS (
      SELECT vec_id AS cent_id, j, sub AS c_sub FROM sub
      WHERE vec_id < {PQ_K}
    ),
    dmat AS (
      SELECT s.vec_id, s.j, c.cent_id,
             {d2.format(a="s.sub", b="c.c_sub")} AS d
      FROM sub s JOIN cent c ON s.j = c.j
    ),
    codes AS (
      SELECT vec_id, j, cent_id AS code FROM (
        SELECT vec_id, j, cent_id,
               row_number() OVER (PARTITION BY vec_id, j
                                  ORDER BY d, cent_id) AS rn
        FROM dmat) WHERE rn = 1
    ),
    lut AS (
      SELECT vec_id AS query_id, j, cent_id, d AS qd_micro
      FROM dmat WHERE vec_id < {PQ_NQ}
    ),
    adc AS (
      SELECT l.query_id, co.vec_id,
             CAST(sum(l.qd_micro) AS BIGINT) AS adc_micro
      FROM codes co
      JOIN lut l ON co.j = l.j AND co.code = l.cent_id
      WHERE co.vec_id <> l.query_id
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT query_id, vec_id, adc_micro,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY adc_micro, vec_id) AS rank
      FROM adc
    )
    SELECT query_id, CAST(rank AS INTEGER) AS rank, vec_id,
           round(adc_micro / 1000000.0, 6) AS adc_dist
    FROM ranked WHERE rank <= {PQ_TOPK}
    ORDER BY query_id, rank
    """


@query("ann_pq_adc_topk", _pq_oracle())
def ann_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed approximate top-k, end to end: codebook → encode →
    per-query ADC LUT → integer-exact scan-and-rank. The DuckDB oracle
    recomputes codebook, codes, LUTs, and rankings — every code and
    every micro distance is value-checked, not just the final ids."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    cb = pq_codebook(emb)
    codes = pq_encode(emb, cb)
    return pq_adc_topk(emb, codes, cb).orderBy("query_id", "rank")


def _pq_rerank_oracle() -> str:
    base = _pq_oracle()
    # reuse the whole ADC pipeline as CTEs, swap the final projection
    # for the shortlist -> exact-rerank stages over the FULL vectors.
    ctes = base[: base.rindex("SELECT query_id")]
    d2 = (
        "CAST(round((list_dot_product({a}, {a})"
        " - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b})) * 1000000) AS BIGINT)"
    )
    full = "CAST({e} AS DOUBLE[])"
    return f"""{ctes.rstrip()},
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


@query("ann_pq_rerank_topk", _pq_rerank_oracle())
def ann_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC shortlist → exact re-rank, the billion-scale serving path:
    full vectors are read for |shortlist| rows per query, not the
    corpus; the oracle replays codebook, codes, LUTs, shortlist, and
    the exact re-rank."""
    emb = load_tables(spark, sf_dir)["embeddings"]
    cb = pq_codebook(emb)
    codes = pq_encode(emb, cb)
    return pq_rerank_topk(emb, codes, cb).orderBy("query_id", "rank")


def _ivfpq_oracle() -> str:
    """The full FAISS architecture replayed in SQL: coarse assignment
    (the certified IVF math), candidate restriction to the probed
    cells, ADC over candidates only, exact re-rank."""
    from .ann import _COS_SQL, CENT_STRIDE, N_PROBE

    base = _pq_oracle()
    pq_ctes = base[: base.index("adc AS (")].rstrip().rstrip(",")
    cos = _COS_SQL.format(a="e.embedding", b="c.cc_emb")
    d2 = (
        "CAST(round((list_dot_product({a}, {a})"
        " - 2 * list_dot_product({a}, {b})"
        " + list_dot_product({b}, {b})) * 1000000) AS BIGINT)"
    )
    full = "CAST({e} AS DOUBLE[])"
    return f"""{pq_ctes},
    centc AS (
      SELECT vec_id AS ccent_id, embedding AS cc_emb
      FROM embeddings WHERE vec_id % {CENT_STRIDE} = 0
    ),
    affin AS (
      SELECT e.vec_id, c.ccent_id,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               round({cos}, 6) DESC, c.ccent_id) AS crank
      FROM embeddings e CROSS JOIN centc c
    ),
    assigned AS (SELECT vec_id, ccent_id FROM affin WHERE crank = 1),
    qcells AS (
      SELECT vec_id AS query_id, ccent_id FROM affin
      WHERE vec_id < {PQ_NQ} AND crank <= {N_PROBE}
    ),
    cand AS (
      SELECT q.query_id, a.vec_id
      FROM assigned a JOIN qcells q ON a.ccent_id = q.ccent_id
      WHERE a.vec_id <> q.query_id
    ),
    adc AS (
      SELECT cd.query_id, cd.vec_id,
             CAST(sum(l.qd_micro) AS BIGINT) AS adc_micro
      FROM cand cd
      JOIN codes co ON co.vec_id = cd.vec_id
      JOIN lut l ON l.query_id = cd.query_id
               AND l.j = co.j AND l.cent_id = co.code
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


@query("ann_ivfpq_topk", _ivfpq_oracle())
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF + PQ + refine — the complete billion-scale serving stack
    (the FAISS IVFPQ,Refine factory), every stage oracle-checked:

    1. coarse quantizer (the certified ``ivf_affinity`` math) assigns
       every vector to a cell; queries probe their ``N_PROBE`` cells —
       the corpus-pruning stage (only probed cells are scored at all);
    2. PQ ADC scores ONLY the candidate (query, vector) pairs, over
       codes, via broadcast LUTs — the compression stage (candidates
       are scored without touching their embeddings);
    3. exact re-rank of the per-query shortlist — the refine stage
       (full vectors re-read for |shortlist| rows, not the corpus).

    At 100 TB the three stages multiply: cells cut candidates ~k/probe
    ×, codes cut candidate bytes 64×, refine caps full-vector reads at
    shortlist × queries. Nothing fact-sized shuffles in any stage."""
    from .ann import N_PROBE, ivf_affinity

    emb = load_tables(spark, sf_dir)["embeddings"]
    affin = ivf_affinity(spark, sf_dir)
    assigned = affin.filter(F.col("crank") == 1).select("vec_id", "cent_id")
    qcells = affin.filter(
        (F.col("vec_id") < PQ_NQ) & (F.col("crank") <= N_PROBE)
    ).select(F.col("vec_id").alias("query_id"), "cent_id")
    cand = (
        assigned.join(F.broadcast(qcells), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    cb = pq_codebook(emb)
    codes = pq_encode(emb, cb)
    qsub = _sub_explode(emb.filter(F.col("vec_id") < PQ_NQ), "query_id")
    lut = qsub.join(F.broadcast(cb), "j").select(
        "query_id",
        "j",
        F.col("cent_id").alias("lut_cent"),
        _d2_micro(F.col("sub"), F.col("c_sub")).alias("qd_micro"),
    )
    adc = (
        codes.join(cand, "vec_id")
        .join(F.broadcast(lut), ["query_id", "j"])
        .filter(F.col("code") == F.col("lut_cent"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("qd_micro").alias("adc_micro"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_micro", "vec_id")
    short = (
        adc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_SHORTLIST)
        .select("query_id", "vec_id")
    )
    return _exact_rerank(
        emb, short, emb.filter(F.col("vec_id") < PQ_NQ), PQ_TOPK
    ).orderBy("query_id", "rank")
