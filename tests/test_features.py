"""Independent third-implementation pins for the r12 feature/stat
entries (ml_*, privacy_dp_noisy_counts, stats_kruskal_wallis,
stats_kendall_tau_monthly, ts_holt_linear_forecast).

The DuckDB oracles certify Spark↔SQL parity; these tests recompute
each result a THIRD way — plain pandas/hashlib, no SQL engine — so an
error shared by both SQL formulations (a wrong formula transcribed
twice) still gets caught.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

TE_THRESHOLD = 250_000.0


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def qs():
    import __spark_entry__  # noqa: F401  (populates the registry)
    from event_to_lakehouse_spark.operators.relational import QUERIES

    return QUERIES


@pytest.fixture(scope="module")
def orders_cust():
    o = pd.read_parquet(f"{SF}/orders.parquet")
    c = pd.read_parquet(f"{SF}/customer.parquet")
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["y"] = (j["o_totalprice"] > TE_THRESHOLD).astype(int)
    return j


def test_target_encoding_matches_pandas(spark, qs, orders_cust):
    got = (
        qs["ml_target_encoding"](spark, SF)
        .toPandas()
        .set_index("c_nationkey")
        .sort_index()
    )
    j = orders_cust
    prior = j["y"].mean()
    fit = j.groupby("c_mktsegment")["y"].agg(["sum", "count"])
    enc = (fit["sum"] + 20.0 * prior) / (fit["count"] + 20.0)
    j = j.assign(enc=j["c_mktsegment"].map(enc))
    exp = j.groupby("c_nationkey").agg(
        n_orders=("y", "size"),
        avg_target_enc=("enc", "mean"),
        raw_rate=("y", "mean"),
    )
    assert (got["n_orders"] == exp["n_orders"]).all()
    assert (got["avg_target_enc"] - exp["avg_target_enc"]).abs().max() < 1e-4
    assert (got["raw_rate"] - exp["raw_rate"]).abs().max() < 1e-4
    # m-estimate shrink: every category encoding sits between its raw
    # rate and the global prior (strictly inside when they differ)
    for seg, e in enc.items():
        raw = fit.loc[seg, "sum"] / fit.loc[seg, "count"]
        lo, hi = min(raw, prior), max(raw, prior)
        assert lo - 1e-12 <= e <= hi + 1e-12


def test_woe_iv_matches_pandas(spark, qs, orders_cust):
    import numpy as np

    got = (
        qs["ml_woe_iv"](spark, SF)
        .toPandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    j = orders_cust
    cat = j.groupby("c_mktsegment")["y"].agg(
        n_pos="sum", n_all="count"
    )
    cat["n_neg"] = cat["n_all"] - cat["n_pos"]
    k = len(cat)
    pf = (cat["n_pos"] + 0.5) / (cat["n_pos"].sum() + 0.5 * k)
    nf = (cat["n_neg"] + 0.5) / (cat["n_neg"].sum() + 0.5 * k)
    woe = np.log(pf / nf)
    iv = ((pf - nf) * woe).sum()
    assert (got["n_pos"] == cat["n_pos"]).all()
    assert (got["n_neg"] == cat["n_neg"]).all()
    assert (got["woe"] - woe).abs().max() < 1e-4
    assert (got["iv_total"] - iv).abs().max() < 1e-4


def test_feature_hashing_matches_hashlib(spark, qs):
    import re

    got = (
        qs["ml_feature_hashing"](spark, SF)
        .toPandas()
        .set_index("bucket")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    rows = []
    for text in docs["text"]:
        for tok in re.split(r"\s+", text.strip().lower()):
            if tok:
                rows.append(
                    (
                        _h60(f"fh:{tok}") % 64,
                        1 if _h60(f"fhs:{tok}") % 2 == 0 else -1,
                        tok,
                    )
                )
    exp = pd.DataFrame(rows, columns=["bucket", "sgn", "token"]).groupby(
        "bucket"
    ).agg(
        n_tokens=("sgn", "size"),
        signed_sum=("sgn", "sum"),
        n_distinct_tokens=("token", "nunique"),
    )
    assert got.shape == exp.shape
    assert (got == exp).all().all()


def test_kruskal_wallis_matches_pandas(spark, qs):
    got = qs["stats_kruskal_wallis"](spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e["value"].notna()]
    e = e.assign(rank=e["value"].rank(method="average"))
    n = len(e)
    g = e.groupby("event_type")["rank"].agg(["sum", "count"])
    h = 12.0 / (n * (n + 1)) * (g["sum"] ** 2 / g["count"]).sum() - 3.0 * (
        n + 1
    )
    t = e.groupby("value").size()
    corr = 1.0 - ((t**3 - t).sum()) / (n**3 - n)
    assert got["n_total"] == n
    assert got["k_groups"] == len(g)
    assert abs(got["h_stat"] - h) < 1e-3
    assert abs(got["h_adj"] - h / corr) < 1e-3


def test_kendall_tau_matches_pandas(spark, qs):
    got = qs["stats_kendall_tau_monthly"](spark, SF).toPandas().iloc[0]
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    li["m"] = li["l_shipdate"].dt.to_period("M")
    li["cents"] = (
        (li["l_extendedprice"] * (1 - li["l_discount"]) * 100)
        .round()
        .astype("int64")
    )
    m = li.groupby("m").agg(x=("m", "size"), y=("cents", "sum"))
    # tau-b by direct O(n^2) enumeration (months are few; no scipy here)
    xs, ys = m["x"].tolist(), m["y"].tolist()
    n = len(xs)
    nc = nd = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            prod = (xs[i] - xs[j]) * (ys[i] - ys[j])
            nc += prod > 0
            nd += prod < 0
            tx += xs[i] == xs[j]
            ty += ys[i] == ys[j]
    n0 = n * (n - 1) // 2
    tau = (nc - nd) / ((n0 - tx) * (n0 - ty)) ** 0.5
    assert got["n_periods"] == len(m)
    assert got["n_pairs"] == len(m) * (len(m) - 1) // 2
    assert abs(got["tau_b"] - tau) < 1e-3


def test_dp_noisy_counts_matches_hashlib(spark, qs):
    import math

    got = (
        qs["privacy_dp_noisy_counts"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    counts = e.groupby("event_type").size()
    for et, n in counts.items():
        u = (_h60(f"dp-release-1:{et}") % 16_777_216 + 0.5) / 16_777_216
        lap = -1.0 * math.copysign(1.0, u - 0.5) * math.log(
            1.0 - 2.0 * abs(u - 0.5)
        )
        exp = max(0.0, n + lap)
        assert abs(got.loc[et, "noisy_count"] - exp) < 1e-3
        assert got.loc[et, "epsilon"] == 1.0
    # the release must actually perturb: not every cell noise-free
    raw = counts.reindex(got.index).astype(float)
    assert (got["noisy_count"] - raw).abs().max() > 1e-6


def test_holt_forecast_matches_python_loop(spark, qs):
    got = (
        qs["ts_holt_linear_forecast"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    daily = (
        e.assign(d=e["ts"].dt.floor("D"))
        .groupby(["event_type", "d"])
        .size()
        .reset_index(name="x")
        .sort_values(["event_type", "d"])
    )
    for et, grp in daily.groupby("event_type"):
        xs = grp["x"].astype(float).tolist()
        level, b = xs[0], 0.0
        for x in xs[1:]:
            lnew = 0.3 * x + 0.7 * (level + b)
            b = 0.1 * (lnew - level) + 0.9 * b
            level = lnew
        assert got.loc[et, "n_days"] == len(xs)
        assert abs(got.loc[et, "level"] - level) < 1e-3
        assert abs(got.loc[et, "trend"] - b) < 1e-3
        assert abs(got.loc[et, "forecast_7d"] - (level + 7 * b)) < 1e-3


def test_mutual_information_matches_pandas(spark, qs, orders_cust):
    import math

    got = (
        qs["ml_mutual_information"](spark, SF)
        .toPandas()
        .set_index("c_mktsegment")
        .sort_index()
    )
    j = orders_cust
    n = len(j)
    pos_tot = j["y"].sum()
    neg_tot = n - pos_tot
    mi = 0.0
    for seg, grp in j.groupby("c_mktsegment"):
        npos, nx = grp["y"].sum(), len(grp)
        nneg = nx - npos
        c = 0.0
        if npos > 0:
            c += (npos / n) * math.log(npos * n / (nx * pos_tot))
        if nneg > 0:
            c += (nneg / n) * math.log(nneg * n / (nx * neg_tot))
        mi += c
        assert abs(got.loc[seg, "mi_contrib"] - c) < 1e-4
    assert abs(got["mi_total"].iloc[0] - mi) < 1e-4
    assert mi >= 0 or abs(mi) < 1e-12  # MI is non-negative


def test_calibration_bins_matches_pandas(spark, qs):
    import numpy as np

    got = (
        qs["ml_calibration_bins"](spark, SF)
        .toPandas()
        .set_index("bin")
        .sort_index()
    )
    o = pd.read_parquet(f"{SF}/orders.parquet")
    o["bin"] = np.floor(o["o_totalprice"] / 50_000).astype("int64")
    o["score"] = 1.0 / (
        1.0 + np.exp(-(o["o_totalprice"] - 250_000.0) / 50_000.0)
    )
    o["y"] = (o["o_totalprice"] > 250_000.0).astype(int)
    exp = o.groupby("bin").agg(
        n_orders=("y", "size"), mean_score=("score", "mean"),
        frac_pos=("y", "mean"),
    )
    assert (got["n_orders"] == exp["n_orders"]).all()
    assert (got["mean_score"] - exp["mean_score"]).abs().max() < 1e-3
    assert (got["frac_pos"] - exp["frac_pos"]).abs().max() < 1e-3
    # monotone sanity: mean score rises with the price bin
    assert got["mean_score"].is_monotonic_increasing


def test_acf_profile_lag1_agrees_with_single_lag_entry(spark, qs):
    prof = qs["events_acf_profile"](spark, SF).toPandas()
    single = qs["events_autocorr_lag1"](spark, SF).toPandas()
    m = prof[prof["lag"] == 1].merge(single, on="event_type")
    assert len(m) == len(single)
    assert (m["acf"] - m["autocorr_lag1"]).abs().max() < 1e-9
    assert set(prof["lag"]) == {1, 2, 3, 7}


def test_gopher_rules_match_pandas(spark, qs):
    import re

    got = (
        qs["text_gopher_quality_rules"](spark, SF)
        .toPandas()
        .set_index("source")
        .sort_index()
    )
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    stops = {"the", "a", "and", "of", "to"}
    rows = []
    for _, r in docs.iterrows():
        toks = [t for t in re.split(r"\s+", r["text"].strip().lower()) if t]
        mean_wl = sum(map(len, toks)) / len(toks)
        stop_hits = sum(t in stops for t in toks)
        rows.append(
            {
                "source": r["source"],
                "f_words": 0 if len(toks) >= 30 else 1,
                "f_wl": 0 if 3.9 <= mean_wl <= 4.9 else 1,
                "f_stop": 0 if stop_hits >= 2 else 1,
            }
        )
    e = pd.DataFrame(rows)
    e["pass"] = (e["f_words"] + e["f_wl"] + e["f_stop"] == 0).astype(int)
    exp = e.groupby("source").agg(
        n_docs=("pass", "size"), n_pass=("pass", "sum"),
        n_fail_words=("f_words", "sum"), n_fail_wordlen=("f_wl", "sum"),
        n_fail_stopwords=("f_stop", "sum"),
    )
    for c in exp.columns:
        assert (got[c] == exp[c]).all(), c


def test_randomized_response_matches_hashlib(spark, qs):
    got = (
        qs["privacy_randomized_response"](spark, SF)
        .toPandas()
        .set_index("c_nationkey")
        .sort_index()
    )
    c = pd.read_parquet(f"{SF}/customer.parquet")
    c["a"] = (c["c_acctbal"] > 5_000.0).astype(int)
    u = c["c_custkey"].map(
        lambda k: (_h60(f"rr-release-1:{k}") % 16_777_216 + 0.5) / 16_777_216
    )
    c["report"] = c["a"].where(u < 0.75, 1 - c["a"])
    exp = c.groupby("c_nationkey").agg(
        n=("report", "size"),
        n_report_yes=("report", "sum"),
        true_rate=("a", "mean"),
    )
    exp["pi_hat"] = (
        exp["n_report_yes"] / exp["n"] + 0.75 - 1.0
    ) / (2 * 0.75 - 1.0)
    assert (got["n"] == exp["n"]).all()
    assert (got["n_report_yes"] == exp["n_report_yes"]).all()
    assert (got["pi_hat"] - exp["pi_hat"]).abs().max() < 1e-3
    # the mechanism must actually flip some responses
    assert (c["report"] != c["a"]).sum() > 0
    # debiasing: pooled pi_hat lands near the true rate
    pooled_hat = (c["report"].mean() + 0.75 - 1.0) / (2 * 0.75 - 1.0)
    assert abs(pooled_hat - c["a"].mean()) < 0.15


def test_kfold_assignment_is_stable_and_partitioning(spark, qs):
    got = qs["ml_kfold_assignment"](spark, SF).toPandas()
    c = pd.read_parquet(f"{SF}/customer.parquet")
    folds = c["c_custkey"].map(lambda k: _h60(f"kfold-1:{k}") % 5)
    exp_counts = folds.value_counts().sort_index()
    g = got.set_index("fold").sort_index()
    assert (g["n_customers"] == exp_counts).all()
    assert set(g.index) == {0, 1, 2, 3, 4}
    o = pd.read_parquet(f"{SF}/orders.parquet")
    assert g["n_orders"].sum() == len(o)  # every order in exactly one fold


def test_dedup_impact_accounting(spark, qs):
    got = qs["corpus_dedup_impact"](spark, SF).toPandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    recrawl = docs[docs["doc_id"] % 10 == 0]
    per_src = docs.groupby("source").size()
    per_src_re = recrawl.groupby("source").size()
    g = got.set_index("source").sort_index()
    exp_docs = (per_src + per_src_re.reindex(per_src.index, fill_value=0))
    assert (g["n_docs"] == exp_docs.sort_index()).all()
    # corpus has no organic exact dups -> kept == originals,
    # and every re-crawled copy is dropped
    assert (g["n_kept"] == per_src.sort_index()).all()
    assert (g["tokens_kept"] <= g["tokens_total"]).all()
    assert (g["doc_dup_rate"] > 0).any()


def test_pca_power_iteration_matches_numpy(spark, qs):
    import numpy as np

    got = (
        qs["emb_pca_power_iteration"](spark, SF)
        .toPandas()
        .set_index("dim")
        .sort_index()
    )
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    q = np.stack(
        [np.round(np.asarray(v, dtype=np.float64) * 1e6) for v in emb["embedding"]]
    )
    n, d = q.shape
    cov = (q.T @ q - np.outer(q.sum(0), q.sum(0)) / n) / (n * 1e12)
    v = np.full(d, 0.125)
    for _ in range(3):
        w = cov @ v
        v = w / np.sqrt((w * w).sum())
    lam = v @ (cov @ v)
    assert got["n_vecs"].iloc[0] == n
    assert np.abs(got["loading"].to_numpy() - v).max() < 1e-4
    assert abs(got["eigval"].iloc[0] - lam) < 1e-3
    # loadings are a unit vector; the Rayleigh quotient is a variance
    assert abs((got["loading"] ** 2).sum() - 1.0) < 1e-3
    assert got["eigval"].iloc[0] > 0


def test_runs_test_matches_python(spark, qs):
    got = qs["stats_runs_test"](spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    daily = (
        o.assign(d=o["o_orderdate"].dt.floor("D"))
        .groupby("d")
        .size()
        .sort_index()
    )
    deltas = daily.diff().dropna()
    s = [1 if v > 0 else -1 for v in deltas if v != 0]
    n, npl = len(s), sum(1 for v in s if v == 1)
    nmi = n - npl
    runs = 1 + sum(1 for a, b in zip(s, s[1:]) if a != b)
    e_r = 2 * npl * nmi / n + 1
    var_r = 2 * npl * nmi * (2 * npl * nmi - n) / (n * n * (n - 1))
    assert got["n_signs"] == n
    assert got["n_plus"] == npl
    assert got["n_runs"] == runs
    assert abs(got["z_runs"] - (runs - e_r) / var_r**0.5) < 1e-3


def test_burstiness_fano_matches_pandas(spark, qs):
    got = (
        qs["events_burstiness_fano"](spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    daily = (
        e.assign(d=e["ts"].dt.floor("D"))
        .groupby(["event_type", "d"])
        .size()
        .rename("y")
        .reset_index()
    )
    for et, grp in daily.groupby("event_type"):
        mean, var = grp["y"].mean(), grp["y"].var(ddof=1)
        sd = var**0.5
        assert got.loc[et, "n_days"] == len(grp)
        assert abs(got.loc[et, "fano"] - var / mean) < 1e-3
        assert abs(got.loc[et, "burstiness"] - (sd - mean) / (sd + mean)) < 1e-3
    # burstiness is bounded in (-1, 1)
    assert got["burstiness"].between(-1, 1).all()


def test_freshness_slo_matches_pandas(spark, qs):
    got = (
        qs["ops_data_freshness_slo"](spark, SF)
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    e = pd.read_parquet(f"{SF}/events.parquet")
    last = e.groupby("event_type")["ts"].max()
    # per-timestamp floor(epoch), matching the entry (NOT floor of the
    # difference — sub-second fractions make those differ by 1)
    ep = last.map(lambda t: t.value // 10**9)
    lag = (ep.max() - ep).astype("int64")
    assert (got["lag_sec"] == lag.sort_index()).all()
    assert (got["within_slo"] == (lag.sort_index() <= 1800)).all()
    assert (got["lag_sec"] == 0).any()  # the newest stream has zero lag


def test_cross_entry_consistency_r12(spark, qs):
    """Product-vs-product invariants across the r12 entries — shared
    quantities computed by independent plans must agree exactly."""
    import math

    # 1. WOE/IV and mutual information share the contingency table
    woe = (
        qs["ml_woe_iv"](spark, SF).toPandas().set_index("c_mktsegment")
    )
    mi = (
        qs["ml_mutual_information"](spark, SF)
        .toPandas()
        .set_index("c_mktsegment")
    )
    assert (woe["n_pos"].sort_index() == mi["n_pos"].sort_index()).all()
    assert (woe["n_neg"].sort_index() == mi["n_neg"].sort_index()).all()

    # 2. k-fold label totals == the shared contingency table's totals
    kf = qs["ml_kfold_assignment"](spark, SF).toPandas()
    assert kf["n_pos"].sum() == woe["n_pos"].sum()
    assert kf["n_orders"].sum() == (woe["n_pos"] + woe["n_neg"]).sum()

    # 3. DP release: every noisy cell within the mechanism's hard noise
    #    bound — max |Laplace^-1(u)| on the (k+0.5)/2^24 grid
    dp = (
        qs["privacy_dp_noisy_counts"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    raw = (
        pd.read_parquet(f"{SF}/events.parquet")
        .groupby("event_type")
        .size()
    )
    bound = -math.log(1.0 / 16_777_216)  # eps=1, u at the grid edge
    diffs = (dp["noisy_count"] - raw.reindex(dp.index)).abs()
    assert (diffs <= bound + 1e-9).all()

    # 4. burstiness entry's mean * days == the type's exact event count
    bf = (
        qs["events_burstiness_fano"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    for et, n in raw.items():
        assert abs(bf.loc[et, "mean_daily"] * bf.loc[et, "n_days"] - n) < 0.5

    # 5. freshness: lag of the globally newest stream is exactly zero,
    #    and every event count matches the raw groupBy
    fr = (
        qs["ops_data_freshness_slo"](spark, SF)
        .toPandas()
        .set_index("event_type")
    )
    assert (fr["n_events"].sort_index() == raw.sort_index()).all()
    assert fr["lag_sec"].min() == 0


def test_cohens_d_matches_pandas_and_ttest_relation(spark, qs):
    got = qs["stats_cohens_d_value"](spark, SF).toPandas().iloc[0]
    e = pd.read_parquet(f"{SF}/events.parquet")
    e = e[e["value"].notna()]
    a = e.loc[e["event_type"] == "click", "value"]
    b = e.loc[e["event_type"] == "view", "value"]
    na, nb = len(a), len(b)
    pooled = (
        ((na - 1) * a.var(ddof=1) + (nb - 1) * b.var(ddof=1))
        / (na + nb - 2)
    ) ** 0.5
    d = (a.mean() - b.mean()) / pooled
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["cohens_d"] - d) < 1e-3
    # cross-entry relation: t ~= d * sqrt(n1 n2 / (n1+n2)) up to the
    # equal-variance approximation (loose tolerance by design)
    t = qs["stats_welch_ttest"](spark, SF).toPandas().iloc[0]["t_stat"]
    approx_t = d * (na * nb / (na + nb)) ** 0.5
    assert abs(t - approx_t) / max(abs(t), 1e-9) < 0.2


def test_gini_matches_python(spark, qs):
    got = qs["orders_gini_concentration"](spark, SF).toPandas().iloc[0]
    o = pd.read_parquet(f"{SF}/orders.parquet")
    cents = (
        (o["o_totalprice"] * 100)
        .round()
        .astype("int64")
        .groupby(o["o_custkey"])
        .sum()
        .sort_values()
        .tolist()
    )
    n, tot = len(cents), sum(cents)
    weighted = sum((i + 1) * x for i, x in enumerate(cents))
    gini = 2.0 * weighted / (n * tot) - (n + 1) / n
    assert got["n_customers"] == n
    assert got["total_cents"] == tot
    assert abs(got["gini"] - gini) < 1e-3
    assert 0.0 <= got["gini"] < 1.0
