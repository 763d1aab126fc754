"""Semantics tests for the LLM-pipeline operators: planted duplicates
must be found; similarity rankings must match a NumPy oracle."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from event_to_lakehouse_spark.dedup.exact import dedup_exact_groups
from event_to_lakehouse_spark.dedup.minhash import candidate_pairs, signatures
from event_to_lakehouse_spark.dedup.simhash import fingerprints, near_pairs
from event_to_lakehouse_spark.functions.vectors import cosine
from event_to_lakehouse_spark.similarity.ann import brute_force_topk

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")  # one-token edit → high Jaccard
FAR = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines today"
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE.upper() + "  ")],
        ["doc_id", "text"],
    )


def _minhash_flavors():
    """Both hash families must satisfy the planted-pair semantics:
    xxhash64 (production) and the md5-slice portable flavor whose
    DuckDB twin the driver value-checks (dedup/portable.py)."""
    from event_to_lakehouse_spark.dedup.portable import seeded_hash_spark

    return [
        ("xxhash64", dict()),
        ("portable", dict(hash_sql=seeded_hash_spark, band_concat=True)),
    ]


@pytest.mark.parametrize("flavor,kw", _minhash_flavors())
def test_minhash_finds_planted_neardup(spark, flavor, kw):
    pairs = {
        (r.doc_id_a, r.doc_id_b): r.jaccard_est
        for r in candidate_pairs(_docs(spark), **kw).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.5
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # case/trim-normalized
    assert not any(3 in p for p in pairs)


def test_minhash_signature_shape(spark):
    sigs = signatures(_docs(spark)).collect()
    assert len(sigs) == 4
    assert all(len(r.sig) == 16 for r in sigs)
    by_id = {r.doc_id: tuple(r.sig) for r in sigs}
    assert by_id[1] == by_id[4]  # normalization-identical docs


def _simhash_flavors():
    from event_to_lakehouse_spark.dedup.portable import (
        P_BAND_BITS,
        P_BITS,
        hash60_spark,
    )

    return [
        ("xxhash64", dict()),
        (
            "portable",
            dict(
                token_hash_sql=hash60_spark("tok"),
                n_bits=P_BITS,
                band_bits=P_BAND_BITS,
            ),
        ),
    ]


@pytest.mark.parametrize("flavor,kw", _simhash_flavors())
def test_simhash_hamming(spark, flavor, kw):
    fp_kw = {k: v for k, v in kw.items() if k != "band_bits"}
    fps = {r.doc_id: r.simhash for r in fingerprints(_docs(spark), **fp_kw).collect()}
    ham_12 = bin(fps[1] ^ fps[2]).count("1")
    ham_13 = bin(fps[1] ^ fps[3]).count("1")
    assert fps[1] == fps[4]
    assert ham_12 < ham_13  # near-dup closer than unrelated
    got = {
        (r.doc_id_a, r.doc_id_b) for r in near_pairs(_docs(spark), **kw).collect()
    }
    assert (1, 4) in got


def test_exact_dedup_counts(spark, tmp_dir):
    docs = _docs(spark)
    docs.write.parquet(f"{tmp_dir}/documents.parquet")
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        spark.read.parquet(f"/root/testdata/sf0.001/{name}.parquet").limit(1).write.parquet(
            f"{tmp_dir}/{name}.parquet"
        )
    groups = dedup_exact_groups(spark, tmp_dir).collect()
    n_copies = {r.keep_id: r.n_copies for r in groups}
    assert n_copies[1] == 2  # doc 4 is a normalized copy of doc 1
    assert len(groups) == 3


def test_brute_force_topk_matches_numpy(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(30, 8)).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(30)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = brute_force_topk(df, df.filter(F.col("vec_id") < 2), k=5).collect()

    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norms @ norms.T
    for q in (0, 1):
        order = [
            i for i in np.argsort(-np.round(sims[q], 6), kind="stable") if i != q
        ][:5]
        got = [r.vec_id for r in sorted(out, key=lambda r: r.rank) if r.query_id == q]
        assert got == order, f"query {q}: {got} != {order}"


def test_cosine_function_exact(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["a", "b"]
    )
    vals = [r.c for r in df.select(cosine("a", "b").alias("c")).collect()]
    assert abs(vals[0]) < 1e-12
    assert abs(vals[1] - 1.0) < 1e-12


def test_cluster_labels_known_graph(spark):
    """Chain 1-2-3 and pair (10,11) must collapse to min-id labels,
    including transitivity across the chain."""
    from event_to_lakehouse_spark.dedup.cluster import cluster_labels

    pairs = spark.createDataFrame(
        [(2, 3), (1, 2), (10, 11)], ["doc_a", "doc_b"]
    )
    got = {r.doc_id: r.cluster_id for r in cluster_labels(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cluster_labels_paths_agree(spark):
    """The size-gated union-find path and the distributed pointer-jump
    loop must label identically — including a long chain (exercises
    multi-round convergence in the distributed path) and an isolated
    pair. small_graph_edges=0 forces the distributed loop."""
    from event_to_lakehouse_spark.dedup.cluster import cluster_labels

    chain = [(i, i + 1) for i in range(20, 35)]  # diameter-15 chain
    pairs = spark.createDataFrame(chain + [(1, 2), (50, 51)], ["doc_a", "doc_b"])
    small = {tuple(r) for r in cluster_labels(pairs).collect()}
    dist = {tuple(r) for r in cluster_labels(pairs, small_graph_edges=0).collect()}
    assert small == dist
    assert {r for r in small if 20 <= r[0] < 50} == {
        (i, 20) for i in range(20, 36)
    }


def test_cluster_labels_empty_graph(spark):
    """No pairs -> no labels, correct schema, both paths."""
    from pyspark.sql import types as T

    from event_to_lakehouse_spark.dedup.cluster import cluster_labels

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("doc_a", T.LongType()),
                          T.StructField("doc_b", T.LongType())])
    )
    for gate in (2_000_000, 0):
        out = cluster_labels(empty, small_graph_edges=gate)
        assert out.columns == ["doc_id", "cluster_id"]
        assert out.count() == 0


def test_lsh_neardup_recall_planted(spark):
    """Random-projection LSH near-dup on an UNLABELED corpus: plant 40
    (base, base+tiny-noise) pairs among 64-dim vectors; bucket-blocked
    pairing must recover >= 90% of them (no label column anywhere)."""
    from event_to_lakehouse_spark.similarity.ann import embedding_neardup_pairs

    rng = np.random.default_rng(123)
    base = rng.normal(size=(40, 64)).astype("float32")
    rows = []
    for i in range(40):
        rows.append((i, [float(x) for x in base[i]]))
        dup = base[i] + rng.normal(scale=0.01, size=64).astype("float32")
        rows.append((100 + i, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    found = {
        (r.vec_id_a, r.vec_id_b)
        for r in embedding_neardup_pairs(df, threshold=0.9).collect()
    }
    recall = sum((i, 100 + i) in found for i in range(40)) / 40
    assert recall >= 0.9, f"planted near-dup recall {recall}"


def test_lsh_topk_multiprobe_finds_planted_neighbor(spark):
    """Multi-probe bucketed ANN must rank each query's planted
    near-identical partner first, and the candidate join must be a
    hash join on the bucket id — never a nested-loop."""
    from event_to_lakehouse_spark.plans import audit_plan
    from event_to_lakehouse_spark.similarity.ann import lsh_topk

    rng = np.random.default_rng(42)
    base = rng.normal(size=(40, 64)).astype("float32")
    rows = []
    for i in range(40):
        rows.append((i, [float(x) for x in base[i]]))
        dup = base[i] + rng.normal(scale=0.01, size=64).astype("float32")
        rows.append((100 + i, [float(x) for x in dup]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    result = lsh_topk(df, F.col("vec_id") < 5, k=3)
    assert audit_plan(result).nested_loop_joins == 0
    out = result.collect()
    hits = sum(
        [r.vec_id for r in out if r.query_id == q and r.rank == 1] == [100 + q]
        for q in range(5)
    )
    assert hits >= 4, f"only {hits}/5 planted neighbors ranked first"


def test_minhash_tunable_parameters(spark):
    """candidate_pairs with production-grade k=32/b=8: planted
    near-dups must still surface and jaccard estimates stay in [0,1] on
    the k-long signature — pins that the parameters are genuinely
    corpus-tunable, not baked-in constants."""
    rows = []
    for i in range(10):
        base = f"document {i} " + " ".join(f"tok{i}_{j}" for j in range(25))
        rows.append((i, base))
        rows.append((100 + i, base + " extra tail token"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = candidate_pairs(docs, n_hashes=32, bands=8).collect()
    found = {(r.doc_id_a, r.doc_id_b): r.jaccard_est for r in pairs}
    hits = sum((i, 100 + i) in found for i in range(10))
    assert hits >= 9
    assert all(0.0 <= j <= 1.0 for j in found.values())
    # the k=32 signature is actually built (not the default 16)
    sig = signatures(docs, n_hashes=32).first().sig
    assert len(sig) == 32


def test_decontaminate_hashed_matches_exact(spark):
    """The hashed (xxhash64 long-key) decontamination path must flag
    exactly the same (train, eval) pairs as the exact string-key form
    the oracle checks — hashing only shrinks the broadcast."""
    from event_to_lakehouse_spark.textops import decontaminate_pairs

    leak = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, f"training doc one {leak} with extra words here"),
        (2, "training doc two entirely different content stream okay"),
        (20, f"eval benchmark question {leak} answer choices follow"),
        (40, "eval other item nothing shared with training corpus"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pred = F.col("doc_id") >= 20
    exact = {
        (r.doc_id, r.eval_doc_id, r.shared_ngrams)
        for r in decontaminate_pairs(docs, pred, hashed=False).collect()
    }
    hashed = {
        (r.doc_id, r.eval_doc_id, r.shared_ngrams)
        for r in decontaminate_pairs(docs, pred, hashed=True).collect()
    }
    assert exact == hashed
    assert any(d == 1 and e == 20 for d, e, _ in hashed)  # the leak is caught
    assert not any(d == 2 for d, _, _ in hashed)


def test_lsh_neardup_multitable_recall_boundary_pairs(spark):
    """VERDICT r2 §wrong-2 regression: pairs that straddle a hyperplane
    of ONE table are exactly what single-table bucket-equality blocking
    misses. Plant 100 (base, base+noise) pairs with a noise scale high
    enough that one 6-bit table loses a noticeable fraction, among 800
    unrelated filler vectors; the multi-table (band-OR) blocking with
    corpus-derived n_bits must recover >= 0.95 of them AND strictly beat
    the single-table path on the same corpus."""
    from event_to_lakehouse_spark.similarity.ann import (
        auto_n_bits,
        embedding_neardup_pairs,
    )

    rng = np.random.default_rng(777)
    rows = []
    n_pairs = 100
    for i in range(n_pairs):
        v = rng.normal(size=64)
        # ~8.5 deg perturbation: cos ~0.99, but P(all 6 sign bits agree)
        # in one table is only ~0.75 — the boundary-straddling regime
        d = v + rng.normal(scale=0.15, size=64)
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in d]))
    for j in range(800):
        rows.append((5000 + j, [float(x) for x in rng.normal(size=64)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    # corpus-derived width: 1000 rows / occupancy 16 -> 6 bits
    assert auto_n_bits(len(rows)) == 6

    def recall(pairs_df):
        found = {(r.vec_id_a, r.vec_id_b) for r in pairs_df.collect()}
        return sum((i, 1000 + i) in found for i in range(n_pairs)) / n_pairs

    multi = recall(embedding_neardup_pairs(df, threshold=0.9))  # auto n_bits
    single = recall(embedding_neardup_pairs(df, n_bits=6, n_tables=1, threshold=0.9))
    assert multi >= 0.95, f"multi-table recall {multi}"
    assert multi > single, f"banding gained nothing: {multi} vs {single}"


def test_auto_n_bits_tracks_corpus_growth():
    """Constant expected occupancy: each 2x corpus growth adds one bit;
    clamped at both ends."""
    from event_to_lakehouse_spark.similarity.ann import auto_n_bits

    assert auto_n_bits(10) == 4  # tiny corpus -> floor
    assert auto_n_bits(1_000) == 6
    assert auto_n_bits(1_000_000) == 16
    assert auto_n_bits(2_000_000) == 17
    assert auto_n_bits(10**12) == 24  # ceiling


def test_ivf_affinity_stride_in_cache_key(spark):
    """Two centroid strides in one session must build and cache two
    DISTINCT affinity indexes (the stride is part of the cache key, as
    the type annotation promises)."""
    from event_to_lakehouse_spark.similarity import ann

    sf = "/root/testdata/sf0.001"
    a100 = ann.ivf_affinity(spark, sf, 100)
    a50 = ann.ivf_affinity(spark, sf, 50)
    try:
        n100 = a100.select("cent_id").distinct().count()
        n50 = a50.select("cent_id").distinct().count()
        assert n50 > n100  # finer stride -> more centroids
        assert ann.ivf_affinity(spark, sf, 100) is a100  # cache hit
        assert ann.ivf_affinity(spark, sf, 50) is a50
    finally:
        ann.unpersist_affinity(spark, sf)


def test_kmeans_ivf_build_converges_and_improves_recall(spark):
    """Full Lloyd loop on planted Gaussian clusters: centroid shift
    must fall below tolerance within the iteration budget, and probing
    through the FITTED centroids must match or beat the raw
    stride-sample centroids on recall@10 vs brute force. Init is
    deliberately bad: ids interleave clusters mod 8, so stride-50
    sampling picks centroids from only the even clusters."""
    from event_to_lakehouse_spark.similarity.ann import (
        brute_force_topk,
        ivf_topk_from_centroids,
        kmeans_fit,
    )

    rng = np.random.default_rng(2024)
    centers = rng.normal(size=(8, 64)) * 5.0
    rows = []
    for i in range(400):
        v = centers[i % 8] + rng.normal(size=64)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q_pred = F.col("vec_id") < 8  # one query per planted cluster

    stride_init = [
        [float(v) for v in r["embedding"]]
        for r in df.filter("vec_id % 50 = 0").orderBy("vec_id").collect()
    ]
    cents, n_iter, shifts = kmeans_fit(df, init_stride=50, max_iter=15, tol=1e-3)
    assert n_iter <= 15 and shifts[-1] < 1e-3, f"no convergence: {shifts}"
    assert shifts[-1] < shifts[0]  # the loop actually moved centroids

    truth = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(df, df.filter(q_pred)).collect()
    }

    def recall(centroids):
        got = {
            (r.query_id, r.vec_id)
            for r in ivf_topk_from_centroids(df, q_pred, centroids).collect()
        }
        return len(got & truth) / len(truth)

    r_fit, r_stride = recall(cents), recall(stride_init)
    assert r_fit >= r_stride, f"k-means {r_fit} worse than stride {r_stride}"
    assert r_fit >= 0.9, f"fitted-IVF recall {r_fit}"


def test_lsh_topk_capped_probe_budget(spark):
    """At production bucket widths the full 1-bit-flip fan-out is
    n_bits+1 probes per query; probe_cap bounds it with query-directed
    probing (flip the smallest-margin hyperplanes first). At n_bits=12
    with a 4-probe cap, planted near-neighbors must still be found far
    more often than with no probes at all, and nearly as often as the
    full 13-probe fan-out."""
    from event_to_lakehouse_spark.similarity.ann import lsh_topk

    rng = np.random.default_rng(99)
    rows = []
    n_q = 20
    for i in range(n_q):
        v = rng.normal(size=64)
        d = v + rng.normal(scale=0.15, size=64)  # boundary-straddling regime
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in d]))
    for j in range(400):
        rows.append((5000 + j, [float(x) for x in rng.normal(size=64)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    pred = F.col("vec_id") < n_q

    def hits(**kw):
        out = lsh_topk(df, pred, n_bits=12, k=3, **kw).collect()
        return sum(
            any(r.query_id == q and r.vec_id == 1000 + q for r in out)
            for q in range(n_q)
        )

    h_capped = hits(probe_cap=4)
    h_none = hits(probe_cap=0)  # exact-bucket only
    h_full = hits()  # all 13 probes
    assert h_capped > h_none, f"margin-directed probes gained nothing ({h_capped} vs {h_none})"
    assert h_capped >= h_full - 2, f"cap lost too much recall ({h_capped} vs {h_full})"
    assert h_capped >= int(0.8 * n_q), f"capped recall too low: {h_capped}/{n_q}"


def test_substring_dedup_planted_passage(spark):
    """Two distinct docs sharing a verbatim 12-token passage: the span
    is found in BOTH docs at the right token offsets; a unique doc is
    absent from the span report; identical twins report dup_frac 1.0
    and fail the keep gate."""
    from event_to_lakehouse_spark.dedup.substring import (
        DUP_FRAC_DROP,
        duplicated_spans,
    )

    passage = " ".join(f"shared{i}" for i in range(12))
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {passage} gamma delta"),
            (2, f"one two three four five {passage}"),
            (3, "entirely unique words nothing repeats here at all ok"),
            (10, "twin text body repeated verbatim in another document x"),
            (11, "twin text body repeated verbatim in another document x"),
        ],
        ["doc_id", "text"],
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in duplicated_spans(docs, k=8).collect()
    }
    # doc 1: passage tokens occupy positions 2..13; doc 2: 5..16
    assert spans[1] == (2, 13)
    assert spans[2] == (5, 16)
    assert 3 not in spans
    assert spans[10] == (0, 8) and spans[11] == (0, 8)
    assert DUP_FRAC_DROP <= 1.0  # twins' frac 1.0 -> keep False


def test_substring_dedup_overlapping_runs_merge(spark):
    """Adjacent/overlapping duplicated k-gram starts must merge into
    ONE maximal span, not a span per gram."""
    from event_to_lakehouse_spark.dedup.substring import duplicated_spans

    long_shared = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, f"pre {long_shared} post"), (2, f"{long_shared} tail words")],
        ["doc_id", "text"],
    )
    rows = duplicated_spans(docs, k=8).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    assert len(per_doc[1]) == 1 and len(per_doc[2]) == 1
    assert per_doc[1][0].span_tokens == 20
    assert per_doc[2][0].span_tokens == 20


def test_ann_recall_at_k_matches_set_overlap(spark):
    """recall@k recomputed from the two operators' collected outputs;
    every value in [0,1], and the average is high enough that the LSH
    banding is actually finding neighbors (not vacuously zero)."""
    from event_to_lakehouse_spark.similarity.ann import (
        TOP_K,
        ann_bruteforce_topk,
        ann_lsh_bucketed_topk,
        ann_recall_at_k,
    )

    sf = "/root/testdata/sf0.001"
    bf: dict = {}
    for r in ann_bruteforce_topk(spark, sf).collect():
        bf.setdefault(r.query_id, set()).add(r.vec_id)
    lsh: dict = {}
    for r in ann_lsh_bucketed_topk(spark, sf).collect():
        lsh.setdefault(r.query_id, set()).add(r.vec_id)
    got = {r.query_id: (r.n_hits, r.recall_at_k)
           for r in ann_recall_at_k(spark, sf).collect()}
    assert set(got) == set(bf)
    for qid, neighbors in bf.items():
        hits = len(neighbors & lsh.get(qid, set()))
        assert got[qid][0] == hits
        assert got[qid][1] == round(hits / TOP_K, 4)
        assert 0.0 <= got[qid][1] <= 1.0
    assert sum(v[1] for v in got.values()) / len(got) > 0.2


# --- MMR diversified re-rank (similarity/mmr.py) ---------------------------


def test_mmr_matches_local_greedy(spark):
    """The distributed greedy == a numpy reference MMR on the same
    integer micro grid (sf0.001) — every pick and every score."""
    import numpy as np

    from event_to_lakehouse_spark.similarity.mmr import (
        MMR_DIV_W,
        MMR_K,
        MMR_NQ,
        MMR_POOL,
        MMR_REL_W,
        ann_mmr_diversified,
    )

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).collect()
    }

    def micro(a, b):
        c = float(a @ b) / (np.sqrt(a @ a) * np.sqrt(b @ b))
        x = c * 1_000_000.0
        return int(np.sign(x) * np.floor(abs(x) + 0.5))  # HALF_UP

    want = []
    for q in range(MMR_NQ):
        rel = {
            v: micro(emb[q], e) for v, e in emb.items() if v != q
        }
        pool = sorted(rel, key=lambda v: (-rel[v], v))[:MMR_POOL]
        sel = [min(pool, key=lambda v: (-rel[v], v))]
        want.append((q, 1, sel[0], rel[sel[0]], MMR_REL_W * rel[sel[0]]))
        for pick in range(2, MMR_K + 1):
            best = None
            for c in pool:
                if c in sel:
                    continue
                pen = max(micro(emb[c], emb[s]) for s in sel)
                score = MMR_REL_W * rel[c] - MMR_DIV_W * pen
                key = (-score, c)
                if best is None or key < best[0]:
                    best = (key, c, score)
            sel.append(best[1])
            want.append((q, pick, best[1], rel[best[1]], best[2]))

    got = [
        (r.query_id, r.pick, r.vec_id, r.rel_micro, r.mmr_score)
        for r in ann_mmr_diversified(spark, "/root/testdata/sf0.001").collect()
    ]
    assert got == want


def test_mmr_skips_planted_near_duplicate(spark):
    """THE diversity guarantee: plant a near-copy of the top result at
    relevance rank 2 — plain top-k would return both; MMR must pick
    the orthogonal lower-relevance candidate first."""
    from pyspark.sql import functions as F

    from event_to_lakehouse_spark.similarity.mmr import mmr_pool, mmr_rerank

    # Query sits between two clusters; the near-dup of pick 1 is the
    # SECOND most relevant candidate, but its ~1.0 similarity to pick
    # 1 outweighs its tiny relevance edge over the other cluster's
    # candidate at lambda=0.7: 7*rel(11) - 3*sim(11,10) ~ 0.3954 <
    # 7*rel(12) - 3*sim(12,10) ~ 0.4029 (x1e6 on the micro grid).
    rows = [
        (0, [1.0, 1.0, 0.0, 0.0]),       # the query
        (10, [1.0, 0.80, 0.0, 0.0]),     # top relevance (cluster A)
        (11, [1.0, 0.79, 0.0, 0.0]),     # near-dup of 10, relevance rank 2
        (12, [0.78, 1.0, 0.0, 0.0]),     # cluster B: barely less relevant
        (13, [0.0, 0.0, 1.0, 0.2]),      # orthogonal filler
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows], ["vec_id", "embedding"]
    )
    pool = mmr_pool(df, df.filter(F.col("vec_id") == 0), pool=4)
    picks = [r.vec_id for r in sorted(
        mmr_rerank(pool, k=3).collect(), key=lambda r: r.pick
    )]
    # plain top-3 by relevance would be [10, 11, 12]; MMR demotes the dup
    assert picks == [10, 12, 11]


# --- hybrid RRF retrieval (retrieval.py) -----------------------------------


def test_rrf_fuse_known_lists(spark):
    """Hand-built rank lists: contributions are 1e6 div (60+rank) per
    side, docs on both lists outrank single-side docs with comparable
    ranks, ties break by doc_id, and absent sides contribute 0."""
    from event_to_lakehouse_spark.retrieval import RRF_K, rrf_fuse

    sparse = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"]
    )
    dense = spark.createDataFrame(
        [(11, 1), (13, 2), (10, 3)], ["doc_id", "rank"]
    )
    rows = {r.doc_id: r for r in rrf_fuse(sparse, dense, k=10).collect()}
    c = lambda rk: 1_000_000 // (RRF_K + rk)
    assert rows[10].rrf_micro == c(1) + c(3)
    assert rows[11].rrf_micro == c(2) + c(1)
    assert rows[12].rrf_micro == c(3)
    assert rows[13].rrf_micro == c(2)
    assert rows[12].dense_rank is None and rows[13].bm25_rank is None
    order = sorted(rows.values(), key=lambda r: r.fused_rank)
    assert [r.doc_id for r in order] == [11, 10, 13, 12]  # both-lists first


def test_hybrid_entry_consistent_with_its_retrievers(spark):
    """Every fused row's per-side ranks agree with the standalone
    certified retrievers, and the fused ordering is exactly the RRF
    arithmetic over those ranks."""
    from event_to_lakehouse_spark.retrieval import (
        DENSE_QUERY_ID,
        RRF_K,
        retrieval_hybrid_rrf,
    )
    from event_to_lakehouse_spark.similarity.ann import brute_force_topk
    from event_to_lakehouse_spark.tables import load_tables
    from event_to_lakehouse_spark.textops import text_bm25_search

    sf = "/root/testdata/sf0.001"
    fused = retrieval_hybrid_rrf(spark, sf).collect()
    sp = {r.doc_id: r.rank for r in text_bm25_search(spark, sf).collect()}
    emb = load_tables(spark, sf)["embeddings"].select("vec_id", "embedding")
    de = {
        r.vec_id: r.rank
        for r in brute_force_topk(
            emb, emb.filter(F.col("vec_id") == DENSE_QUERY_ID)
        ).collect()
    }
    assert fused
    for r in fused:
        assert r.bm25_rank == sp.get(r.doc_id)
        assert r.dense_rank == de.get(r.doc_id)
        want = (1_000_000 // (RRF_K + r.bm25_rank) if r.bm25_rank else 0) + (
            1_000_000 // (RRF_K + r.dense_rank) if r.dense_rank else 0
        )
        assert r.rrf_micro == want
    scores = [(r.rrf_micro, -r.doc_id) for r in fused]
    assert scores == sorted(scores, reverse=True)
