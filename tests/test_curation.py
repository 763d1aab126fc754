"""Semantics pins for the curation operators: planted repetitive
documents must be dropped; domain-mix keep rates must track the target
weights."""

from __future__ import annotations

from pyspark.sql import functions as F

from event_to_lakehouse_spark.curation import (
    DUP_NGRAM_MAX,
    MIX_WEIGHTS,
    corpus_domain_mix,
    text_repetition_filter,
)


def _with_docs(spark, tmp_dir, rows):
    spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"]) \
        .write.parquet(f"{tmp_dir}/documents.parquet")
    for name in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "embeddings",
    ]:
        spark.read.parquet(f"/root/testdata/sf0.001/{name}.parquet").limit(
            1
        ).write.parquet(f"{tmp_dir}/{name}.parquet")
    return tmp_dir


def test_repetition_filter_drops_planted_loops(spark, tmp_dir):
    clean = (
        "the quick brown fox jumps over a lazy dog near this river bank "
        "while two birds sing softly and children play outside in warm sun"
    )
    loop = "spam beacon alpha beta gamma " * 12  # one 5-gram repeated
    onetok = "word " * 30  # top word = 100% of tokens
    _with_docs(
        spark,
        tmp_dir,
        [
            (1, clean, "en", "s", len(clean)),
            (2, loop.strip(), "en", "s", len(loop)),
            (3, onetok.strip(), "en", "s", len(onetok)),
        ],
    )
    got = {r.doc_id: r for r in text_repetition_filter(spark, tmp_dir).collect()}
    assert got[1].keep and got[1].dup_ngram_frac == 0.0
    assert not got[2].keep and got[2].dup_ngram_frac > DUP_NGRAM_MAX
    assert not got[3].keep and got[3].top_word_frac == 1.0


def test_domain_mix_tracks_target_weights(spark):
    out = corpus_domain_mix(spark, "/root/testdata/sf0.01")
    rates = {
        r.source: r.keep_rate
        for r in out.select("source", "keep_rate").distinct().collect()
    }
    # sf0.01 sources are uniform (25 docs each), so rates reduce to
    # w_d / max_w exactly
    max_w = max(MIX_WEIGHTS.values())
    # integer thresholds floor, so rates sit within 1e-3 of the ideal
    assert abs(rates["src0"] - MIX_WEIGHTS["src0"] / max_w) < 1e-3
    assert abs(rates["src1"] - MIX_WEIGHTS["src1"] / max_w) < 1e-3
    assert abs(rates["src5"] - 1 / max_w) < 1e-3
    # the deterministic keep set: rerun == same rows
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in corpus_domain_mix(spark, "/root/testdata/sf0.01").collect())
    assert a == b


def test_countmin_never_undercounts(spark):
    """CM estimates are exact counts plus non-negative collision noise:
    est >= exact for every key, and the true heaviest user appears in
    the top-k (it cannot be displaced below keys it truly dominates by
    more than the collision bound)."""
    from event_to_lakehouse_spark.operators.events import (
        events_heavyhitters_cm,
    )
    from event_to_lakehouse_spark.tables import load_tables

    sf = "/root/testdata/sf0.01"
    est = {
        r.user_id: r.est_count
        for r in events_heavyhitters_cm(spark, sf).collect()
    }
    exact = {
        r.user_id: r.n
        for r in load_tables(spark, sf)["events"]
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert all(est[u] >= exact[u] for u in est)
    top_true = max(exact, key=lambda u: (exact[u], -u))
    assert top_true in est


def test_portable_hash_cross_engine_exact(spark):
    """hash60 must agree bit-for-bit between Spark and DuckDB on
    adversarial inputs: unicode, quotes, backslashes, empty, long."""
    import duckdb

    from event_to_lakehouse_spark.dedup.portable import (
        hash60_duck,
        hash60_spark,
    )

    samples = [
        "", " ", "a", "Hello, World!", "naïve café über",
        "日本語テキスト", "quote'mid", 'double"quote', "back\\slash",
        "tab\tsep", "x" * 5000, "0", "-1", "mix 'both' \"kinds\"",
    ]
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"])
    got_spark = [
        r.h for r in sdf.selectExpr(f"{hash60_spark('s')} AS h").collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.sql(
            "SELECT " + hash60_duck("?::VARCHAR"), params=[s]
        ).fetchone()[0]
        for s in samples
    ]
    assert got_spark == got_duck
    assert all(0 <= h < (1 << 60) for h in got_spark)


def test_countmin_sketch_merges_across_batches(spark):
    """The CM sketch is a mergeable aggregate: building it per half of
    the corpus and SUMMING the cells equals building it in one pass —
    the property that makes it shippable as partial aggregates from
    1000 executors (and incrementally from micro-batches)."""
    from pyspark.sql import functions as F

    from event_to_lakehouse_spark.operators.events import (
        CM_D,
        _cm_bucket_spark,
    )
    from event_to_lakehouse_spark.tables import load_tables

    events = load_tables(spark, "/root/testdata/sf0.01")["events"]
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(_cm_bucket_spark(j, "user_id")).alias("bucket"),
            )
            for j in range(CM_D)
        ]
    )

    def sketch(df):
        return (
            df.select(F.explode(cells).alias("e"))
            .select("e.j", "e.bucket")
            .groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    full = {(r.j, r.bucket): r.c for r in sketch(events).collect()}
    lo = sketch(events.filter(F.col("event_id") % 2 == 0))
    hi = sketch(events.filter(F.col("event_id") % 2 == 1))
    merged = {
        (r.j, r.bucket): r.c
        for r in lo.unionByName(hi)
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
        .collect()
    }
    assert merged == full


def test_portable_sketch_accuracy(spark):
    """The oracle proves cross-engine EQUALITY; these pins prove the
    estimates are also CLOSE to truth: HLL within the ~3-sigma band of
    its m=64 standard error, histogram quantiles within 5%."""
    from event_to_lakehouse_spark.operators.sketches import (
        agg_hll_portable,
        agg_quantile_histogram,
    )
    from event_to_lakehouse_spark.tables import load_tables

    sf = "/root/testdata/sf0.01"
    est = agg_hll_portable(spark, sf).first()[0]
    exact = load_tables(spark, sf)["events"].select("user_id").distinct().count()
    assert abs(est - exact) / exact < 0.40  # 3 x 1.04/sqrt(64)

    got = {r.q: r.est for r in agg_quantile_histogram(spark, sf).collect()}
    true = (
        load_tables(spark, sf)["events"]
        .selectExpr("percentile(value, array(0.5, 0.9, 0.99)) AS p")
        .first()[0]
    )
    for q, t in zip((0.5, 0.9, 0.99), true):
        assert abs(got[q] - t) / abs(t) < 0.05


def test_hll_merge_equals_one_pass(spark):
    """Max-merging per-day HLL register tables must give the SAME
    estimate as the one-pass sketch — register-wise max is the HLL
    merge operator."""
    from event_to_lakehouse_spark.operators.sketches import (
        agg_hll_portable,
        agg_hll_portable_merge,
    )

    sf = "/root/testdata/sf0.01"
    one = agg_hll_portable(spark, sf).first()[0]
    merged = agg_hll_portable_merge(spark, sf).first()
    assert merged.approx_distinct == one
    assert merged.n_partials > 64  # really merged multiple days


def test_quantile_histogram_constant_column(spark, tmp_path):
    """Degenerate range (ADVICE r4): a constant value column makes
    (value-mn)/(mx-mn) 0/0 — the guard must put every row in bin 0 and
    return the constant as every quantile, not NULL/NaN."""
    import os

    from event_to_lakehouse_spark.operators.sketches import (
        agg_quantile_histogram,
    )
    from event_to_lakehouse_spark.tables import TABLES

    sf = str(tmp_path / "sf_const")
    os.makedirs(sf)
    src = "/root/testdata/sf0.001"
    for name in TABLES:
        if name != "events":
            os.symlink(f"{src}/{name}.parquet", f"{sf}/{name}.parquet")
    spark.range(100).selectExpr(
        "CAST(id AS BIGINT) AS event_id", "CAST(42.5 AS DOUBLE) AS value"
    ).write.parquet(f"{sf}/events.parquet")

    rows = agg_quantile_histogram(spark, sf).collect()
    assert [r.q for r in rows] == [0.5, 0.9, 0.99]
    assert all(r.est == 42.5 for r in rows)


def test_leakage_safe_split_no_straddling_pairs(spark):
    """THE guard: no near-dup pair may straddle splits (a test doc's
    near-twin in train contaminates the eval). Also: deterministic
    across calls, covers every doc exactly once, and the hash split
    lands within loose 80/10/10 bounds."""
    from event_to_lakehouse_spark.curation import corpus_leakage_safe_split
    from event_to_lakehouse_spark.dedup.jaccard import dedup_ngram_jaccard
    from event_to_lakehouse_spark.tables import load_tables

    sf = "/root/testdata/sf0.01"
    split = {r.doc_id: r.split for r in corpus_leakage_safe_split(spark, sf).collect()}
    pairs = dedup_ngram_jaccard(spark, sf).collect()
    assert pairs, "corpus has near-dup pairs to guard"
    straddle = [
        (p.doc_a, p.doc_b)
        for p in pairs
        if split[p.doc_a] != split[p.doc_b]
    ]
    assert straddle == []
    n = load_tables(spark, sf)["documents"].count()
    assert len(split) == n
    from collections import Counter

    frac = {k: v / n for k, v in Counter(split.values()).items()}
    assert 0.65 <= frac.get("train", 0) <= 0.95
    assert frac.get("val", 0) <= 0.25 and frac.get("test", 0) <= 0.25
    again = {
        r.doc_id: r.split for r in corpus_leakage_safe_split(spark, sf).collect()
    }
    assert again == split


def test_anomaly_zscore_planted_spike(spark, tmp_path):
    """A 10x volume spike after a steady baseline must flag (and ONLY
    it); the first hours with <2 trailing observations score NULL."""
    import os

    from event_to_lakehouse_spark.operators.events import events_anomaly_zscore
    from event_to_lakehouse_spark.tables import TABLES

    sf = str(tmp_path / "sf_spike")
    os.makedirs(sf)
    src = "/root/testdata/sf0.001"
    for name in TABLES:
        if name != "events":
            os.symlink(f"{src}/{name}.parquet", f"{sf}/{name}.parquet")
    rows = []
    eid = 0
    for h in range(30):
        per_hour = 50 if h == 27 else 5  # steady 5/h, spike at hour 27
        for _ in range(per_hour):
            rows.append((eid, h))
            eid += 1
    spark.createDataFrame(rows, ["event_id", "h"]).selectExpr(
        "event_id",
        "timestamp'2024-03-01 00:00:17' + make_interval(0,0,0,0,h) AS ts",
        "'click' AS event_type",
    ).write.parquet(f"{sf}/events.parquet")

    out = events_anomaly_zscore(spark, sf).collect()
    flagged = [r for r in out if r.is_anomaly]
    assert len(flagged) == 1 and flagged[0].n == 50
    assert out[0].zscore is None  # no trailing baseline yet
    assert all(not r.is_anomaly for r in out if r.n == 5)


def test_unigram_perplexity_flags_gibberish(spark, tmp_path):
    """A byte-noise document must score far higher perplexity than
    repetitive natural text drawn from the corpus distribution — and
    fail the keep gate while the natural docs pass."""
    import os

    from event_to_lakehouse_spark.curation import text_unigram_perplexity
    from event_to_lakehouse_spark.tables import TABLES

    sf = str(tmp_path / "sf_ppl")
    os.makedirs(sf)
    src = "/root/testdata/sf0.001"
    for name in TABLES:
        if name != "documents":
            os.symlink(f"{src}/{name}.parquet", f"{sf}/{name}.parquet")
    common = "the quick brown fox jumps over the lazy dog " * 30
    gibberish = " ".join(f"zq{i}xv{i * 7}j" for i in range(200))
    rows = [(i, common, "en", "web", len(common)) for i in range(20)]
    rows.append((99, gibberish, "xx", "noise", len(gibberish)))
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(f"{sf}/documents.parquet")

    out = {r.doc_id: r for r in text_unigram_perplexity(spark, sf).collect()}
    natural_ppl = out[0].perplexity
    assert out[99].perplexity > 10 * natural_ppl
    assert not out[99].keep
    assert all(out[i].keep for i in range(20))


def test_bpe_train_matches_reference(spark):
    """The distributed BPE trainer must reproduce the classic Sennrich
    reference algorithm exactly — merge sequence AND final
    segmentation — on a corpus with overlap traps (aaa under an (a,a)
    merge, fused symbols that must not re-match their parts)."""
    from collections import Counter

    from event_to_lakehouse_spark.curation import bpe_encode, bpe_train

    freqs = {
        "lower": 6, "lowest": 3, "newer": 8, "newest": 5,
        "wider": 2, "aaa": 4, "banana": 3, "low": 7,
    }
    words = spark.createDataFrame(list(freqs.items()), "tok string, n long")
    n_merges = 8
    merges, seg = bpe_train(words, n_merges)

    # --- pure-Python reference (Sennrich greedy, same tie-break) ---
    ref = {w: list(w) for w in freqs}
    ref_merges = []
    for _ in range(n_merges):
        counts = Counter()
        for w, syms in ref.items():
            for x, y in zip(syms, syms[1:]):
                counts[(x, y)] += freqs[w]
        if not counts:
            break
        # tie-break: highest count, then lexicographically smallest (a, b)
        top_n = max(counts.values())
        best = min(p for p, c in counts.items() if c == top_n)
        if counts[best] < 2:
            break
        ref_merges.append(best)
        a, b = best
        for w, syms in ref.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            ref[w] = out
    assert merges == ref_merges

    got = {r.tok: list(r.symbols) for r in seg.collect()}
    assert got == ref

    # encode with the trained merges reproduces the training segmentation
    enc = bpe_encode(words, merges)
    got_enc = {r.tok: list(r.symbols) for r in enc.collect()}
    assert got_enc == ref


def test_cluster_stats_partition_the_corpus(spark):
    """Histogram rows partition the corpus: sum(n_docs) == corpus size,
    every non-singleton row has size >= 2, excess == docs - clusters,
    and the implied duplicate count matches the label table."""
    from event_to_lakehouse_spark.dedup.cluster import (
        dedup_cluster_labels,
        dedup_cluster_stats,
    )

    sf = "/root/testdata/sf0.001"
    df = dedup_cluster_stats(spark, sf).toPandas()
    n_docs_total = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert df.n_docs.sum() == n_docs_total
    assert (df.excess_docs == df.n_docs - df.n_clusters).all()
    assert (df[df.cluster_size > 1].cluster_size >= 2).all()
    labels = dedup_cluster_labels(spark, sf).toPandas()
    # excess over multi-doc clusters == labeled docs minus distinct clusters
    multi = df[df.cluster_size > 1]
    assert multi.excess_docs.sum() == len(labels) - labels.cluster_id.nunique()


def test_mixture_plan_waterfills_within_budget(spark):
    import pytest
    """Allocation invariants: nothing exceeds the epoch cap, the plan
    never exceeds the budget, and the leftover after the one
    redistribution round is only nonzero if every source is capped."""
    from event_to_lakehouse_spark.curation import (
        MIXP_EPOCH_CAP,
        corpus_mixture_plan,
    )

    sf = "/root/testdata/sf0.001"
    df = corpus_mixture_plan(spark, sf).toPandas()
    budget = df.available_tokens.sum() // 2
    assert (df.planned_tokens <= MIXP_EPOCH_CAP * df.available_tokens + 1e-6).all()
    assert df.planned_tokens.sum() <= budget + 1e-4
    assert (df.epochs <= MIXP_EPOCH_CAP + 1e-9).all()
    capped = df.planned_tokens >= MIXP_EPOCH_CAP * df.available_tokens - 1e-6
    if not capped.all():
        # some source could absorb more: the round-2 waterfill must
        # have spent (nearly) the whole budget
        assert df.planned_tokens.sum() == pytest.approx(budget, rel=1e-6)
    # weights actually skew the plan: weight-3 source gets more than a
    # weight-1 source with comparable availability
    w3 = df[df.weight == 3]
    w1 = df[df.weight == 1]
    if len(w3) and len(w1):
        assert w3.planned_tokens.iloc[0] > w1.planned_tokens.mean() * 1.5
