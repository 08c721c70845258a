"""Independent recompute replays for the oracle-checked formula keys
that previously relied on the differential alone (r7 verdict task 6 —
the bartlett class: an identical WRONG expression on both engines
hashes green, so every derived-formula key needs a third, independent
derivation). Pattern follows tests/test_stats.py: run the registered
DuckDB oracle on the raw fixture parquet and compare against a
numpy/pandas recompute of the textbook formula — no Spark session
needed, so these replays are fast and engine-independent.

Tolerances: oracles round display values to 3-6 decimals and several
pin intermediates to 1e-6/1e-9 integer grids; the float recompute is
asserted within 1e-3 of the rounded output unless the value is exact
by construction.
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb
import numpy as np
import pandas as pd
import pytest

from engine.registry import all_oracles

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"

_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _oracle(key: str, sf: str = SF) -> pd.DataFrame:
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    return con.execute(all_oracles()[key]).df()


def _events(sf: str = SF) -> pd.DataFrame:
    return duckdb.connect().execute(
        f"SELECT event_id, ts, user_id, event_type, value "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).df()


def _docs(sf: str = SF) -> pd.DataFrame:
    return duckdb.connect().execute(
        f"SELECT doc_id, text, lang FROM read_parquet('{sf}/documents.parquet')"
    ).df()


def test_vwap_matches_weighted_mean():
    got = _oracle("q_vwap").set_index("l_partkey")
    li = duckdb.connect().execute(
        f"SELECT l_partkey, l_extendedprice, l_quantity "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    assert len(got) > 0
    for pk, g in li.groupby("l_partkey"):
        if len(g) < 3:
            assert pk not in got.index
            continue
        vwap = g["l_extendedprice"].sum() / g["l_quantity"].sum()
        assert abs(got.loc[pk, "vwap"] - round(vwap, 4)) < 1e-9, pk


def test_bollinger_matches_pandas_rolling():
    got = _oracle("q_win_bollinger", SF01).set_index("event_id")
    assert len(got) > 0
    ev = _events(SF01).sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        v = g["value"].reset_index(drop=True)
        mid = v.rolling(20).mean()
        sd = v.rolling(20).std(ddof=1)
        for i in range(19, len(v)):
            eid = g["event_id"].iloc[i]
            assert abs(got.loc[eid, "mid"] - round(mid[i], 4)) < 1e-6
            assert abs(got.loc[eid, "upper"] - round(mid[i] + 2 * sd[i], 4)) < 1e-3
            breach = v[i] > mid[i] + 2 * sd[i] or v[i] < mid[i] - 2 * sd[i]
            assert got.loc[eid, "breach"] == int(breach)
            checked += 1
    assert checked == len(got)


def test_rsi_matches_wilder_sma_form():
    got = _oracle("q_win_rsi", SF01).set_index("event_id")
    assert len(got) > 0
    ev = _events(SF01).sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        delta = g["value"].diff().dropna().reset_index(drop=True)
        eids = g["event_id"].iloc[1:].reset_index(drop=True)
        gains = delta.clip(lower=0)
        losses = (-delta).clip(lower=0)
        ag = gains.rolling(14).mean()
        al = losses.rolling(14).mean()
        for i in range(13, len(delta)):
            rsi = 100.0 if al[i] == 0 else 100.0 - 100.0 / (1.0 + ag[i] / al[i])
            assert abs(got.loc[eids[i], "rsi"] - round(rsi, 4)) < 1e-6
            checked += 1
    assert checked == len(got)


def test_market_beta_matches_cov_over_var():
    got = _oracle("q_market_beta", SF01).set_index("event_type")
    assert len(got) > 0
    ev = _events(SF01)
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    daily = ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    mkt = daily.groupby("day")["cents"].sum().rename("mcents")
    checked = 0
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").set_index("day")
        x = np.log(g["cents"]).diff().dropna()
        m = np.log(mkt.loc[g.index].astype(float)).diff().dropna()
        both = pd.concat([x, m], axis=1).dropna()
        if len(both) < 2:
            continue
        xs, ms = both.iloc[:, 0].to_numpy(), both.iloc[:, 1].to_numpy()
        beta = np.cov(xs, ms, ddof=0)[0, 1] / np.var(ms)
        assert abs(got.loc[et].iloc[-1] - beta) < 1e-2, et
        checked += 1
    assert checked == len(got)


def test_anomaly_zscore_matches_global_z():
    got = _oracle("q_anomaly_zscore", SF01)
    assert len(got) > 0
    ev = _events(SF01)
    expected = set()
    zmap = {}
    for _, g in ev.groupby("user_id"):
        mu, sigma = g["value"].mean(), g["value"].std(ddof=1)
        z = (g["value"] - mu) / sigma
        for eid, zi in zip(g["event_id"], z):
            if abs(zi) > 2.5:
                expected.add(eid)
                zmap[eid] = zi
    assert set(got["event_id"]) == expected
    for _, r in got.iterrows():
        assert abs(r["z"] - round(zmap[r["event_id"]], 4)) < 1e-6


def test_win_corr_matches_pearson():
    got = _oracle("q_win_corr", SF01).set_index("user_id")
    assert len(got) > 0
    ev = _events(SF01)
    base = pd.Timestamp("2024-01-01")
    ev["xs"] = (pd.to_datetime(ev["ts"]) - base).dt.total_seconds() * 1e6
    for uid, g in ev.groupby("user_id"):
        if len(g) < 20:
            assert uid not in got.index
            continue
        r = np.corrcoef(g["value"], g["xs"])[0, 1]
        assert abs(got.loc[uid, "drift_corr"] - round(r, 4)) < 1e-6, uid


def test_holt_matches_python_fold():
    got = _oracle("q_win_holt").set_index("user_id")
    assert len(got) > 0
    ev = _events().sort_values(["user_id", "ts", "event_id"])
    for uid, g in ev.groupby("user_id"):
        vs = g["value"].tolist()
        level, trend = vs[0], 0.0
        for v in vs[1:]:
            prev = level
            level = 0.3 * v + 0.7 * (level + trend)
            trend = 0.1 * (level - prev) + 0.9 * trend
        assert got.loc[uid, "n_ticks"] == len(vs)
        assert abs(got.loc[uid, "level"] - round(level, 4)) < 1e-6, uid
        assert abs(got.loc[uid, "trend"] - round(trend, 4)) < 1e-6, uid


def _epoch_days(ts: pd.Series) -> pd.Series:
    """Unit-safe day index (the events parquet stores MICROSECOND
    timestamps and pandas 2.x preserves datetime64[us] — .astype(int64)
    silently yields µs, the r8 trap this helper exists for)."""
    secs = (pd.to_datetime(ts).dt.floor("D") - pd.Timestamp("1970-01-01"))
    return (secs.dt.total_seconds() // 86400).astype("int64")


def test_rolling_ols_matches_polyfit():
    got = _oracle("q_win_rolling_ols", SF01).set_index(["event_type", "di"])
    assert len(got) > 0
    ev = _events(SF01)
    ev["di"] = _epoch_days(ev["ts"])
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    d = ev.groupby(["event_type", "di"])["cents"].sum().reset_index()
    checked = 0
    for et, g in d.groupby("event_type"):
        g = g.sort_values("di").reset_index(drop=True)
        for i in range(1, len(g)):
            w = g.iloc[max(0, i - 29) : i + 1]
            slope = np.polyfit(w["di"], w["cents"], 1)[0]
            key = (et, g["di"].iloc[i])
            assert abs(got.loc[key, "slope_cents_per_day"] - round(slope, 6)) < 1e-3
            checked += 1
    assert checked == len(got)


def test_did_matches_cell_mean_contrast():
    got = _oracle("q_stats_did", SF01).set_index("event_type")
    assert len(got) > 0
    ev = _events(SF01)
    ev["arm"] = ev["user_id"].map(
        lambda u: int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) % 2
    )
    ev["post"] = (pd.to_datetime(ev["ts"]) >= pd.Timestamp("2024-01-16")).astype(int)
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    for et, g in ev.groupby("event_type"):
        cells = g.groupby(["arm", "post"])["cents"].mean()
        if len(cells) < 4:
            assert et not in got.index
            continue
        did = (cells[(0, 1)] - cells[(0, 0)]) - (cells[(1, 1)] - cells[(1, 0)])
        assert abs(got.loc[et, "did"] - round(did / 100.0, 4)) < 1e-6, et


def test_changepoint_matches_best_sse_split():
    got = _oracle("q_stats_changepoint", SF01).set_index("event_type")
    assert len(got) > 0
    ev = _events(SF01)
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    d = ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    checked = 0
    for et, g in d.groupby("event_type"):
        y = g.sort_values("day")["cents"].to_numpy(np.float64)
        days = g.sort_values("day")["day"].dt.strftime("%Y-%m-%d").tolist()
        n = len(y)
        if n < 2:
            continue

        def sse(a):
            return ((a - a.mean()) ** 2).sum() if len(a) else 0.0

        costs = [sse(y[: k + 1]) + sse(y[k + 1 :]) for k in range(n - 1)]
        best = int(np.argmin(costs))
        assert got.loc[et, "split_day"] == days[best], et
        assert got.loc[et, "n_days"] == n
        checked += 1
    assert checked == len(got)


def test_text_entropy_matches_shannon():
    got = _oracle("q_text_entropy").set_index("doc_id")
    docs = _docs()
    assert len(got) == len(docs)
    for _, r in docs.iterrows():
        counts = pd.Series(list(r["text"])).value_counts().to_numpy(np.float64)
        p = counts / counts.sum()
        h = -(p * np.log2(p)).sum()
        assert abs(got.loc[r["doc_id"], "char_entropy"] - round(h, 4)) < 1e-6


def test_text_zipf_matches_loglog_ols():
    got = _oracle("q_text_zipf")
    assert len(got) == 1
    docs = _docs()
    toks = pd.Series(
        [t for text in docs["text"] for t in text.split(" ")]
    ).value_counts()
    # top-100 with the oracle's (count desc, token asc) tie order
    top = (
        toks.rename("c").reset_index().rename(columns={"index": "tok"})
        .sort_values(["c", "tok"], ascending=[False, True])
        .head(100)
    )
    r = np.arange(1, len(top) + 1, dtype=np.float64)
    slope = np.polyfit(np.log(r), np.log(top["c"].to_numpy(np.float64)), 1)[0]
    # oracle pins ln to a 1e-6 grid; the float OLS must agree closely
    assert abs(got["zipf_slope"].iloc[0] - slope) < 2e-3
    assert got["zipf_slope"].iloc[0] < 0  # Zipf's law: decreasing


def test_text_readability_matches_flesch():
    got = _oracle("q_text_readability").set_index("doc_id")
    docs = _docs()
    assert len(got) > 0
    for _, r in docs.iterrows():
        if len(r["text"]) == 0:
            continue
        words = len(r["text"].split(" "))
        sentences = max(len(re.findall(r"[.!?]", r["text"])), 1)
        syllables = max(len(re.findall(r"[aeiouy]+", r["text"].lower())), 1)
        flesch = 206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)
        row = got.loc[r["doc_id"]]
        assert row["words"] == words and row["sentences"] == sentences
        assert row["syllables"] == syllables
        assert abs(row["flesch"] - round(flesch, 3)) < 1e-6


def test_eval_ndcg_matches_float_dcg():
    got = _oracle("q_eval_ndcg").set_index("label")
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding[2] AS score, embedding[3] AS g3 "
        f"FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    assert len(got) > 0
    emb["rel"] = np.clip(np.floor((emb["g3"].astype(float) + 1) * 2), 0, 3).astype(int)
    for lbl, g in emb.groupby("label"):
        by_score = g.sort_values(["score", "vec_id"], ascending=[False, True])
        by_rel = g.sort_values(["rel", "vec_id"], ascending=[False, True])
        dcg = sum(
            (2 ** r - 1) / math.log(i + 2)
            for i, r in enumerate(by_score["rel"].head(10))
        )
        idcg = sum(
            (2 ** r - 1) / math.log(i + 2)
            for i, r in enumerate(by_rel["rel"].head(10))
        )
        want = 0.0 if idcg == 0 else dcg / idcg
        assert abs(got.loc[lbl, "ndcg_10"] - want) < 1e-5, lbl


def test_user_entropy_matches_histogram():
    got = _oracle("q_user_entropy", SF01).set_index("entropy")
    ev = _events(SF01)
    hist: dict[float, int] = {}
    for _, g in ev.groupby("user_id"):
        c = g["event_type"].value_counts().to_numpy(np.float64)
        p = c / c.sum()
        h = round(float(-(p * np.log2(p)).sum()), 2) + 0.0
        hist[h] = hist.get(h, 0) + 1
    assert len(got) > 0
    for h, n in hist.items():
        assert got.loc[h, "n_users"] == n, h
    assert int(got["n_users"].sum()) == sum(hist.values())


def test_pagerank_matches_float_iteration():
    """Five damped (0.85) iterations over the label-blocked top-3
    rounded-cosine graph must agree with a pure-float replay within
    the oracle's 1e-12 integer-grid truncation error on its top-20
    output rows."""
    got = _oracle("q_graph_pagerank").set_index("vec_id")
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding "
        f"FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    assert len(got) > 0
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for _, r in emb.iterrows()}
    edges: list[tuple[int, int]] = []
    for _, g in emb.groupby("label"):
        ids = g["vec_id"].tolist()
        for a in ids:
            cos = []
            for b in ids:
                if a == b:
                    continue
                va, vb = vecs[a], vecs[b]
                c = round(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)), 4)
                cos.append((-c, b))
            cos.sort()
            edges.extend((a, b) for _, b in cos[:3])
    outdeg: dict[int, int] = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    ranks = {v: 1.0 for v in vecs}
    for _ in range(5):
        contrib: dict[int, float] = {}
        for a, b in edges:
            contrib[b] = contrib.get(b, 0.0) + ranks[a] / outdeg[a]
        ranks = {v: 0.15 + 0.85 * contrib.get(v, 0.0) for v in vecs}
    for v in got.index:
        assert abs(float(got.loc[v, "rank"]) - ranks[v]) < 1e-3, v
    # and the top-20 selection itself matches the float ordering
    top_float = sorted(ranks, key=lambda v: (-ranks[v], v))[:20]
    assert set(got.index) == set(top_float)


def test_stochastic_matches_pandas_rolling():
    got = _oracle("q_win_stochastic", SF01).set_index("event_id")
    assert len(got) > 0
    ev = _events(SF01).sort_values(["user_id", "ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        v = g["value"].reset_index(drop=True)
        lo = v.rolling(14).min()
        hi = v.rolling(14).max()
        pk = pd.Series(
            [
                50.0 if hi[i] == lo[i] else 100.0 * (v[i] - lo[i]) / (hi[i] - lo[i])
                for i in range(len(v))
            ]
        )
        pk[:13] = np.nan
        pd_ = pk.rolling(3, min_periods=1).mean()
        eids = g["event_id"].reset_index(drop=True)
        for i in range(13, len(v)):
            assert abs(got.loc[eids[i], "pct_k"] - round(pk[i], 4)) < 1e-6
            # %D averages only the qualifying rows (first two have
            # shorter histories, matching the SQL's frame over k rows)
            window = pk[max(13, i - 2) : i + 1]
            assert abs(got.loc[eids[i], "pct_d"] - round(window.mean(), 4)) < 1e-6
            checked += 1
    assert checked == len(got)


def test_autocorr_matches_pearson_lag1():
    got = _oracle("q_win_autocorr", SF01).set_index("event_type")
    assert len(got) > 0
    ev = _events(SF01)
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    d = ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    checked = 0
    for et, g in d.groupby("event_type"):
        g = g.sort_values("day")
        r = np.log(g["cents"].astype(float)).diff().dropna().to_numpy()
        if len(r) <= 3:
            continue
        x, y = r[1:], r[:-1]
        ac = np.corrcoef(x, y)[0, 1]
        # the oracle pins returns to a 1e-6 grid before the moment fold
        assert abs(got.loc[et, "autocorr_lag1"] - ac) < 1e-2, et
        checked += 1
    assert checked == len(got)


def test_anomaly_mad_matches_numpy_median():
    got = _oracle("q_anomaly_mad", SF01).set_index("event_type")
    assert len(got) > 0
    ev = _events(SF01)
    for et, g in ev.groupby("event_type"):
        med = np.median(g["value"])
        mad = np.median(np.abs(g["value"] - med))
        n_out = int((np.abs(g["value"] - med) > 3 * 1.4826 * mad).sum())
        row = got.loc[et]
        assert abs(row["med"] - round(med, 4)) < 1e-9
        assert abs(row["mad"] - round(mad, 4)) < 1e-9
        assert row["n_outliers"] == n_out and row["n_ticks"] == len(g)


def test_eval_pr_at_k_matches_definition():
    got = _oracle("q_eval_pr_at_k").set_index("label")
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding[2] AS score, embedding[3] AS g3 "
        f"FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    assert len(got) > 0
    emb["rel"] = (emb["g3"].astype(float) > 0).astype(int)
    for lbl, g in emb.groupby("label"):
        top = g.sort_values(["score", "vec_id"], ascending=[False, True]).head(10)
        hits, n_rel = int(top["rel"].sum()), int(g["rel"].sum())
        row = got.loc[lbl]
        assert row["hits"] == hits and row["n_rel"] == n_rel
        assert abs(row["precision_10"] - round(hits / 10.0, 6)) < 1e-12
        want_rec = 0.0 if n_rel == 0 else hits / n_rel
        assert abs(row["recall_10"] - round(want_rec, 6)) < 1e-9


def test_corr_matrix_matches_pairwise_pearson():
    got = _oracle("q_corr_matrix", SF01).set_index(["type_a", "type_b"])
    assert len(got) > 0
    ev = _events(SF01)
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    d = ev.groupby(["event_type", "day"])["value"].mean().unstack(0)
    types = sorted(d.columns)
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            both = d[[ta, tb]].dropna()
            r = np.corrcoef(both[ta], both[tb])[0, 1]
            assert abs(got.loc[(ta, tb), "corr"] - round(r, 4)) < 1e-6


def test_volatility_matches_range_window():
    got = _oracle("q_win_volatility", SF01).set_index("event_id")
    ev = _events(SF01).copy()
    ev["es"] = (
        (pd.to_datetime(ev["ts"]).dt.floor("s") - pd.Timestamp("1970-01-01"))
        .dt.total_seconds()
        .astype("int64")
    )
    checked = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values("es").reset_index(drop=True)
        for i in range(len(g)):
            w = g[(g["es"] >= g["es"][i] - 3600) & (g["es"] <= g["es"][i])]
            sd = w["value"].std(ddof=1)
            gotv = got.loc[g["event_id"][i], "vol_1h"]
            if len(w) < 2 or pd.isna(sd):
                assert pd.isna(gotv)
            else:
                assert abs(gotv - round(sd, 4)) < 1e-6
            checked += 1
    assert checked == len(got)


def test_embed_centroids_matches_quantize_average():
    got = _oracle("q_embed_centroids").set_index(["label", "pos"])
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding "
        f"FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    assert len(got) > 0
    checked = 0
    for lbl, g in emb.groupby("label"):
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        q = np.floor(np.clip(mat, -1.0, 1.0) * 127 + 0.5).astype(np.int64)
        cent = q.sum(axis=0) / (127.0 * len(g))
        for pos in range(mat.shape[1]):
            row = got.loc[(lbl, pos + 1)]
            assert row["n_vecs"] == len(g)
            assert abs(row["centroid_v"] - (round(cent[pos], 4) + 0.0)) < 1e-9
            checked += 1
    assert checked == len(got)


def test_doc_quality_model_matches_logistic():
    got = _oracle("q_doc_quality_model").set_index("doc_id")
    docs = _docs()
    stops = {"the", "a", "an", "and", "of", "to", "in", "is", "it", "for"}
    assert len(got) > 0
    checked = 0
    for _, r in docs.iterrows():
        text = r["text"]
        if len(text) == 0:
            continue
        words = text.split(" ")
        n_stop = sum(1 for w in text.lower().split(" ") if w in stops)
        n_dig = len(re.findall(r"[0-9]", text))
        z = (
            (len(words) - 40) / 40.0
            + 2.0 * (n_stop / len(words))
            - 4.0 * (n_dig / len(text))
        )
        quality = 1.0 / (1.0 + math.exp(-z))
        row = got.loc[r["doc_id"]]
        assert row["words"] == len(words)
        assert abs(row["quality"] - round(quality, 4)) < 1e-9
        assert row["keep"] == int(quality > 0.5)
        checked += 1
    assert checked == len(got)


def test_text_repetition_matches_distinct_ratio():
    got = _oracle("q_text_repetition").set_index("doc_id")
    docs = _docs()
    assert len(got) == len(docs)
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        ratio = 1.0 - len(set(w)) / len(w)
        row = got.loc[r["doc_id"]]
        assert row["n_tokens"] == len(w) and row["n_distinct"] == len(set(w))
        # compare UNROUNDED (a fixture doc hits an exact .XXXX5 tie,
        # where python round() is half-even but DuckDB is half-up)
        assert abs(row["repetition_ratio"] - ratio) < 6e-5
        assert bool(row["is_repetitive"]) == (ratio > 0.7)


def test_retention_matches_cohort_offsets():
    got = _oracle("q_retention", SF01).set_index(["cohort_day", "day_offset"])
    ev = _events(SF01)
    ev["day"] = (
        (pd.to_datetime(ev["ts"]) - pd.Timestamp("1970-01-01"))
        .dt.total_seconds() // 86400
    ).astype("int64")
    cohort = ev.groupby("user_id")["day"].min().rename("cohort_day")
    j = ev.join(cohort, on="user_id")
    j["day_offset"] = j["day"] - j["cohort_day"]
    want = (
        j[["user_id", "cohort_day", "day_offset"]]
        .drop_duplicates()
        .groupby(["cohort_day", "day_offset"])
        .size()
    )
    assert len(got) == len(want)
    for key, n in want.items():
        assert got.loc[key, "n_users"] == n, key


def test_cohort_ltv_matches_cumulative_mean():
    got = _oracle("q_cohort_ltv", SF01).set_index(["cohort", "age"])
    ev = _events(SF01)
    ts = pd.to_datetime(ev["ts"])
    ev["month"] = ts.dt.to_period("M")
    first = ev.groupby("user_id")["month"].min().rename("cohort")
    j = ev.join(first, on="user_id")
    j["age"] = (j["month"] - j["cohort"]).map(lambda d: d.n)
    j["cents"] = np.floor(j["value"] * 100).astype("int64")
    sizes = first.reset_index().groupby("cohort")["user_id"].nunique()
    ca = (
        j.groupby(["cohort", "age"])
        .agg(cents=("cents", "sum"), active_users=("user_id", "nunique"))
        .reset_index()
        .sort_values(["cohort", "age"])
    )
    assert len(got) == len(ca)
    for coh, g in ca.groupby("cohort"):
        cum = 0
        size = sizes[coh]
        for _, r in g.iterrows():
            cum += r["cents"]
            ltv = math.floor(cum / size) / 100.0
            row = got.loc[(str(coh), r["age"])]
            assert row["active_users"] == r["active_users"]
            assert row["cohort_size"] == size
            assert abs(row["cum_ltv_per_user"] - ltv) < 1e-9


def test_anomaly_seasonal_matches_dow_zscore():
    """Per-day-of-week z-score with the oracle's ss = Σ(c²//100)
    packing un-done in floats — the //100 moment packing is exactly
    the kind of shared expression a differential cannot audit."""
    got = _oracle("q_anomaly_seasonal", SF01).set_index(["event_type", "day"])
    assert len(got) > 0
    ev = _events(SF01)
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    daily = ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    daily["dw"] = pd.to_datetime(daily["day"]).dt.dayofweek
    checked = 0
    for (et, _), g in daily.groupby(["event_type", "dw"]):
        n = len(g)
        if n <= 1:
            continue
        c = g["cents"].to_numpy(np.float64)
        mu = c.mean()
        # oracle: var from ss = Σ(c²//100), scaled back by 100 —
        # replay the exact packing so the comparison is apples-to-
        # apples, then ALSO check it stays within 1% of the true var
        ss_packed = float((g["cents"].to_numpy(np.int64) ** 2 // 100).sum())
        var_packed = max((ss_packed * 100.0 - mu * mu * n) / (n - 1), 1.0)
        var_true = max(c.var(ddof=1), 1.0)
        assert abs(var_packed - var_true) <= 0.01 * var_true + 100
        for _, r in g.iterrows():
            z = (r["cents"] - mu) / math.sqrt(var_packed)
            key = (et, r["day"].strftime("%Y-%m-%d"))
            assert abs(got.loc[key, "seasonal_z"] - round(z, 4)) < 1e-6
            checked += 1
    assert checked == len(got)


def test_topk_movers_matches_pct_change():
    got = _oracle("q_topk_movers", SF01)
    assert len(got) == 10
    ev = _events(SF01)
    ev["day"] = pd.to_datetime(ev["ts"]).dt.floor("D")
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    daily = ev.groupby(["event_type", "day"])["cents"].sum().reset_index()
    movers = []
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        for i in range(1, len(g)):
            prev = g["cents"][i - 1]
            if prev > 0:
                pct = round((g["cents"][i] - prev) * 100.0 / prev, 4)
                movers.append((abs(pct), et, g["day"][i].strftime("%Y-%m-%d"), pct))
    movers.sort(key=lambda t: (-t[0], t[1], t[2]))
    for row, (_, et, day, pct) in zip(got.itertuples(index=False), movers[:10]):
        assert (row.event_type, row.day) == (et, day)
        assert abs(row.pct_change - pct) < 1e-9


def test_time_intelligence_matches_mom_yoy():
    got = _oracle("q_time_intelligence", SF01).set_index(["event_type", "month"])
    assert len(got) > 0
    ev = _events(SF01)
    ev["month"] = pd.to_datetime(ev["ts"]).dt.to_period("M")
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    m = ev.groupby(["event_type", "month"])["cents"].sum().reset_index()
    checked = 0
    for et, g in m.groupby("event_type"):
        g = g.sort_values("month").reset_index(drop=True)
        for i in range(len(g)):
            key = (et, str(g["month"][i]))
            row = got.loc[key]
            assert abs(row["revenue"] - g["cents"][i] / 100.0) < 1e-9
            if i >= 1:
                prev = g["cents"][i - 1]
                mom = round((g["cents"][i] - prev) * 100.0 / prev, 4) + 0.0
                assert abs(row["mom_pct"] - mom) < 1e-9
            else:
                assert pd.isna(row["mom_pct"])
            checked += 1
    assert checked == len(got)


def test_text_quality_matches_lexical_blend():
    got = _oracle("q_text_quality").set_index("doc_id")
    docs = _docs()
    assert len(got) == len(docs)
    stops = {"the", "a", "of", "and", "to"}
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        dr = len(set(w)) / len(w)
        sr = sum(1 for x in w if x in stops) / len(w)
        row = got.loc[r["doc_id"]]
        assert row["n_tokens"] == len(w)
        assert abs(row["distinct_ratio"] - dr) < 1e-12
        assert abs(row["stopword_ratio"] - sr) < 1e-12
        assert abs(row["quality"] - (0.5 * dr + 0.5 * (1.0 - sr))) < 1e-12


def test_text_stats_matches_per_lang_means():
    got = _oracle("q_text_stats").set_index("lang")
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text, lang, source, n_chars "
        f"FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    assert len(got) > 0
    for lang, g in docs.groupby("lang"):
        toks = g["text"].map(lambda t: len(t.split(" ")))
        row = got.loc[lang]
        assert row["n_docs"] == len(g)
        assert row["n_sources"] == g["source"].nunique()
        assert abs(row["avg_chars"] - round(g["n_chars"].mean(), 4)) < 1e-6
        assert abs(row["avg_tokens"] - round(toks.mean(), 4)) < 1e-6
        assert row["total_tokens"] == int(toks.sum())


def test_multimodal_struct_matches_l2_norm():
    got = _oracle("q_multimodal_struct").set_index("doc_id")
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding "
        f"FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    assert len(got) > 0
    checked = 0
    for _, r in emb.iterrows():
        if r["vec_id"] not in got.index:
            continue
        v = np.asarray(r["embedding"], dtype=np.float64)
        row = got.loc[r["vec_id"]]
        assert row["dim"] == len(v)
        assert abs(row["emb_norm"] - round(float(np.sqrt((v * v).sum())), 6)) < 1e-9
        checked += 1
    assert checked == len(got)


# ---------------------------------------------------------------------------
# r9: replays for the hash-counting family (content-addressed md5
# splits/samples/diffs). These keys were differential-only; the md5
# gate and the downstream counting are re-derived here from the raw
# fixture with hashlib — fully independent of both engines' SQL texts.
# ---------------------------------------------------------------------------


def _h32(s: str) -> int:
    """First 8 hex digits of md5 as an unsigned int — the exact gate
    expression both engines use (CAST('0x'||substr(md5(x),1,8) AS
    BIGINT))."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def test_sample_quota_matches_hash_order_replay():
    got = _oracle("q_sample_quota")
    docs = _docs()
    assert len(got) > 0
    want = []
    for source, g in docs.join(
        duckdb.connect().execute(
            f"SELECT doc_id, source FROM read_parquet('{SF}/documents.parquet')"
        ).df().set_index("doc_id")["source"],
        on="doc_id",
    ).groupby("source"):
        order = sorted(
            g["doc_id"],
            key=lambda d: (hashlib.md5(f"quota:{d}".encode()).hexdigest(), d),
        )
        want += [(d, source, i + 1) for i, d in enumerate(order[:10])]
    assert sorted(map(tuple, got[["doc_id", "source", "rn"]].itertuples(index=False))) == sorted(want)


def test_split_contamination_matches_shingle_replay():
    got = _oracle("q_split_contamination").set_index("doc_id")
    docs = _docs()
    train: set[str] = set()
    test_docs = {}
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        if len(w) < 8:
            continue
        bucket = _h32("split:" + r["text"]) % 100
        sh = {" ".join(w[i : i + 8]) for i in range(len(w) - 7)}
        if bucket < 80:
            train |= sh
        elif bucket >= 90:
            test_docs[r["doc_id"]] = sh
    want = {
        d: len(sh & train) for d, sh in test_docs.items() if len(sh & train) > 0
    }
    assert want, "fixture produced no contaminated test docs"
    assert {d: int(got.loc[d, "n_shared_shingles"]) for d in got.index} == want


def test_sample_mixture_matches_rate_gate_replay():
    got = set(_oracle("q_sample_mixture")["doc_id"])
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    n_by_lang = docs.groupby("lang").size().to_dict()
    want = set()
    for _, r in docs.iterrows():
        target = 0.4 if r["lang"] == "en" else 0.15
        rate = min(1.0, target * 300.0 / n_by_lang[r["lang"]])
        if _h32(f"mix:{r['doc_id']}") % 10000 < math.floor(rate * 10000):
            want.add(r["doc_id"])
    assert len(want) > 0
    assert got == want


def test_snapshot_diff_matches_cdc_replay():
    got = _oracle("q_snapshot_diff").set_index("o_orderkey")
    orders = duckdb.connect().execute(
        f"SELECT o_orderkey, o_totalprice FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    want = {}
    for _, r in orders.iterrows():
        ks = str(int(r["o_orderkey"]))
        price = float(r["o_totalprice"])
        in_old = _h32("ins:" + ks) % 100 >= 10
        in_new = _h32("del:" + ks) % 100 >= 10
        new_price = (
            math.floor(price * 110) / 100.0
            if _h32("upd:" + ks) % 100 < 20
            else price
        )
        if in_old and not in_new:
            want[int(r["o_orderkey"])] = ("delete", round(price, 2), None)
        elif in_new and not in_old:
            want[int(r["o_orderkey"])] = ("insert", None, round(new_price, 2))
        elif in_old and in_new and new_price != price:
            want[int(r["o_orderkey"])] = ("update", round(price, 2), round(new_price, 2))
    assert len(want) > 100  # inserts+deletes+updates all occur at sf0.001
    assert len(got) == len(want)
    for k, (ct, op, np_) in want.items():
        row = got.loc[k]
        assert row["change_type"] == ct, k
        assert (op is None and pd.isna(row["old_price"])) or abs(row["old_price"] - op) < 1e-9
        assert (np_ is None and pd.isna(row["new_price"])) or abs(row["new_price"] - np_) < 1e-9


def test_pipeline_pretrain_matches_stage_replay():
    got = _oracle("q_pipeline_pretrain").set_index(["split", "lang"])
    docs = _docs()
    seen_text: set[str] = set()
    agg: dict[tuple[str, str], list[int]] = {}
    for _, r in docs.sort_values("doc_id").iterrows():
        w = r["text"].split(" ")
        if 1.0 - len(set(w)) / len(w) > 0.7:
            continue  # repetition filter
        if r["text"] in seen_text:
            continue  # exact dedup keeps min doc_id
        seen_text.add(r["text"])
        b = _h32("split:" + r["text"]) % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        a = agg.setdefault((split, r["lang"]), [0, 0])
        a[0] += 1
        a[1] += len(w)
    assert len(agg) > 3
    assert len(got) == len(agg)
    for k, (n, toks) in agg.items():
        assert int(got.loc[k, "n_docs"]) == n, k
        assert int(got.loc[k, "total_tokens"]) == toks, k


def test_rollup_incremental_matches_base_plus_delta_replay():
    got = _oracle("q_rollup_incremental").set_index(["day", "event_type"])
    ev = _events()
    ev = ev.assign(
        day=ev["ts"].astype("datetime64[ns]").dt.strftime("%Y-%m-%d"),
        is_base=ev["event_id"].map(lambda e: _h32(f"inc:{e}") % 100 < 80),
    )
    want: dict[tuple[str, str], list[int]] = {}
    checked = 0
    for (day, et), g in ev.groupby(["day", "event_type"]):
        n = len(g)
        # floor-cents computed PER PARTITION (base, delta) then summed,
        # exactly as an incremental rollup would merge
        cents = sum(
            math.floor(sub["value"].sum() * 100)
            for _, sub in g.groupby("is_base")
        )
        row = got.loc[(day, et)]
        assert int(row["n"]) == n
        # floor(float-sum * 100) sits on a cent boundary for one sf0.001
        # group: pandas' summation order lands 1 ulp above DuckDB's and
        # the floor splits them. The formula (per-partition floor-cents,
        # then merge-add) is confirmed; allow the boundary ulp.
        assert abs(int(row["cents"]) - cents) <= 1
        checked += 1
    assert checked == len(got) and checked > 10


def test_time_to_event_matches_epoch_replay():
    got = _oracle("q_time_to_event").set_index("user_id")
    ev = _events()
    # unit-safe µs epoch (fixture timestamp unit varies by generation)
    ev = ev.assign(us=ev["ts"].astype("datetime64[ns]").astype("int64") // 1000)
    want = {}
    for uid, g in ev.groupby("user_id"):
        views = g[g["event_type"] == "view"]["us"]
        if views.empty:
            continue
        v = int(views.min())
        purch = g[(g["event_type"] == "purchase") & (g["us"] >= v)]["us"]
        if purch.empty:
            continue
        p = int(purch.min())
        want[uid] = (v, p, (p - v) // 1_000_000)
    assert len(want) > 0
    assert len(got) == len(want)
    for uid, (v, p, lat) in want.items():
        row = got.loc[uid]
        assert (int(row["first_view_us"]), int(row["first_purchase_us"]), int(row["latency_s"])) == (v, p, lat)


def test_order_cadence_matches_gap_histogram_replay():
    got = _oracle("q_order_cadence").set_index("gap_days")
    orders = duckdb.connect().execute(
        f"SELECT o_custkey, o_orderkey, o_orderdate FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    orders["d"] = pd.to_datetime(orders["o_orderdate"])
    hist: dict[int, int] = {}
    for _, g in orders.sort_values(["o_orderdate", "o_orderkey"]).groupby("o_custkey"):
        days = list(g["d"])
        for a, b in zip(days, days[1:]):
            gap = (b - a).days
            hist[gap] = hist.get(gap, 0) + 1
    assert sum(hist.values()) > 100
    assert {int(k): int(v) for k, v in got["n_intervals"].items()} == hist


def test_graph_degree_matches_distinct_edge_replay():
    got = _oracle("q_graph_degree").set_index("degree")
    li = duckdb.connect().execute(
        f"SELECT DISTINCT l_partkey, l_suppkey FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    deg = li.groupby("l_partkey").size()
    hist = deg.value_counts().to_dict()
    assert {int(k): int(v) for k, v in got["n_parts"].items()} == {
        int(k): int(v) for k, v in hist.items()
    }


def test_events_attribution_matches_last_touch_replay():
    got = _oracle("q_events_attribution").set_index("channel")
    ev = _events()
    want: dict[str, list[int]] = {}
    for _, g in ev.groupby("user_id"):
        g = g.assign(is_p=(g["event_type"] == "purchase").astype(int))
        g = g.sort_values(["ts", "is_p", "event_id"])
        last_ch = None
        for _, r in g.iterrows():
            if r["event_type"] == "purchase":
                ch = last_ch or "direct"
                a = want.setdefault(ch, [0, 0])
                a[0] += 1
                a[1] += math.floor(r["value"] * 100)
            else:
                last_ch = r["event_type"]
    assert len(want) > 1
    assert len(got) == len(want)
    for ch, (n, cents) in want.items():
        assert int(got.loc[ch, "n_purchases"]) == n, ch
        assert int(got.loc[ch, "attributed_cents"]) == cents, ch


# ---------------------------------------------------------------------------
# r9: replays for the token/byte-counting text keys and the remaining
# hash-gated similarity keys — independent python re-derivations of
# the counting, regex, canonicalization and hash-rank logic.
# ---------------------------------------------------------------------------


def test_text_langid_matches_stopword_count_replay():
    got = _oracle("q_text_langid").set_index("doc_id")
    docs = _docs()
    sets = {
        "s_en": {"the", "a", "of"},
        "s_de": {"table", "row", "batch"},
        "s_fr": {"value", "key", "hash"},
    }
    assert len(got) == len(docs)
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        row = got.loc[r["doc_id"]]
        s = {k: sum(1 for t in w if t in v) for k, v in sets.items()}
        for k, v in s.items():
            assert int(row[k]) == v, (r["doc_id"], k)
        pred = (
            "en"
            if s["s_en"] >= s["s_de"] and s["s_en"] >= s["s_fr"]
            else ("de" if s["s_de"] >= s["s_fr"] else "fr")
        )
        assert row["predicted_lang"] == pred


def test_text_fingerprint_matches_rolling_hash_replay():
    got = _oracle("q_text_fingerprint").set_index("doc_id")
    docs = _docs()
    assert len(got) == len(docs)
    for _, r in docs.iterrows():
        acc = 0
        for t in r["text"].split(" "):
            acc = (acc * 31 + len(t) + (ord(t[0]) if t else 0)) % 1000000007
        assert int(got.loc[r["doc_id"], "fingerprint"]) == acc


def test_text_pii_matches_python_re_replay():
    got = _oracle("q_text_pii").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, props FROM read_parquet('{SF}/events.parquet')"
    ).df()
    pat = re.compile(
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+|[0-9]{3}-[0-9]{2}-[0-9]{4}|[0-9]+"
    )
    assert len(got) == len(ev)
    n_with = 0
    for _, r in ev.iterrows():
        row = got.loc[r["event_id"]]
        assert row["props_redacted"] == pat.sub("<PII>", r["props"])
        n = len(pat.findall(r["props"]))
        assert int(row["n_redactions"]) == n
        n_with += n > 0
    assert n_with > 0


def test_text_ngram_top_matches_bigram_count_replay():
    got = _oracle("q_text_ngram_top")
    docs = _docs()
    counts: dict[str, dict[str, int]] = {}
    for _, r in docs.iterrows():
        w = r["text"].split(" ")
        if len(w) < 2:
            continue
        c = counts.setdefault(r["lang"], {})
        for a, b in zip(w, w[1:]):
            bg = a + " " + b
            c[bg] = c.get(bg, 0) + 1
    want = []
    for lang, c in counts.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        want += [(lang, bg, n) for bg, n in top]
    assert len(want) >= 10
    assert sorted(map(tuple, got[["lang", "bigram", "cnt"]].itertuples(index=False))) == sorted(want)


def test_dedup_url_matches_canonicalization_replay():
    got = _oracle("q_dedup_url").set_index("canonical_url")
    docs = _docs()
    groups: dict[str, list[int]] = {}
    for _, r in docs.iterrows():
        d = int(r["doc_id"])
        # independent canonicalizer: lowercase host, strip default
        # port, query string and trailing slash
        path = f"/page/{d % 400}" + ("/" if d % 2 == 0 else "")
        if path.endswith("/"):
            path = path[:-1]
        canon = "https://www.example.com" + path
        groups.setdefault(canon, []).append(d)
    assert len(got) == len(groups)
    for canon, ids in groups.items():
        row = got.loc[canon]
        assert int(row["n_variants"]) == len(ids)
        assert int(row["keeper"]) == min(ids)


def test_sample_negative_matches_hash_rank_replay():
    got = _oracle("q_sample_negative")
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    emb["bucket"] = emb["vec_id"].map(lambda v: _h32(str(v)) % 16)
    by_bucket: dict[int, list[tuple[int, object]]] = {}
    for _, r in emb.iterrows():
        by_bucket.setdefault(int(r["bucket"]), []).append((int(r["vec_id"]), r["label"]))
    want = []
    for _, a in emb.iterrows():
        aid, ab, al = int(a["vec_id"]), int(a["bucket"]), a["label"]
        cands = [
            (hashlib.md5(f"neg:{aid}:{c}".encode()).hexdigest(), c)
            for c, lab in by_bucket.get((ab + 1) % 16, [])
            if lab != al
        ]
        for rank, (_, c) in enumerate(sorted(cands)[:2], 1):
            want.append((aid, c, rank))
    assert len(want) > 100
    assert sorted(map(tuple, got[["anchor_id", "neg_id", "rank"]].itertuples(index=False))) == sorted(want)


def test_dedup_incremental_matches_trigram_jaccard_replay():
    got = _oracle("q_dedup_incremental").set_index("incoming_id")
    docs = _docs()
    grams = {}
    bucket = {}
    for _, r in docs.iterrows():
        t = r["text"].lower()
        w = t.split(" ")
        # DuckDB list slice w[i:i+3] is 1-based INCLUSIVE => 4-token
        # shingles, i = 1..len-3 (empty below 4 tokens)
        grams[int(r["doc_id"])] = {
            " ".join(w[i : i + 4]) for i in range(max(len(w) - 3, 0))
        }
        bucket[int(r["doc_id"])] = _h32(r["text"]) % 5
    incoming = [d for d, b in bucket.items() if b == 0]
    existing = [d for d, b in bucket.items() if b != 0]
    want = {}
    for i in incoming:
        best = None
        for e in existing:
            inter = len(grams[i] & grams[e])
            if not inter:
                continue
            j = inter / (len(grams[i]) + len(grams[e]) - inter)
            # the rank orders by the ROUNDED jaccard (the emitted
            # column), tie-broken by smaller existing_id
            if j >= 0.5 and (
                best is None or (round(j, 4), -e) > (round(best[1], 4), -best[0])
            ):
                best = (e, j)
        if best:
            want[i] = best
    assert len(want) > 3
    assert len(got) == len(want)
    for i, (e, j) in want.items():
        row = got.loc[i]
        assert int(row["existing_id"]) == e, i
        assert abs(row["jaccard"] - round(j, 4)) < 1e-9, i


# ---------------------------------------------------------------------------
# r9: replays for the counting/selection family (OHLCV bars, grids,
# pattern flags) — pandas re-derivations of first/last/min/max
# selection and gap/grid construction.
# ---------------------------------------------------------------------------


def _ts_us(ts: pd.Series) -> pd.Series:
    return ts.astype("datetime64[ns]").astype("int64") // 1000


def test_bars_ohlcv_matches_pandas_groupby():
    got = _oracle("q_bars_ohlcv").set_index(["bar_start", "event_type"])
    ev = _events().sort_values(["ts", "event_id"])
    ev["bar"] = _ts_us(ev["ts"]) // 3_600_000_000 * 3600
    checked = 0
    for (bar, et), g in ev.groupby(["bar", "event_type"]):
        row = got.loc[(bar, et)]
        assert row["open"] == g["value"].iloc[0]
        assert row["close"] == g["value"].iloc[-1]
        assert row["high"] == g["value"].max()
        assert row["low"] == g["value"].min()
        assert int(row["n_trades"]) == len(g)
        assert abs(row["volume"] - round(g["value"].sum(), 2)) < 2e-2
        checked += 1
    assert checked == len(got) > 50


def test_bar_gaps_matches_grid_complement():
    got = _oracle("q_bar_gaps")
    ev = _events()
    ev["bar"] = _ts_us(ev["ts"]) // 3_600_000_000 * 3600
    want = []
    for et, g in ev.groupby("event_type"):
        present = set(g["bar"])
        for b in range(min(present), max(present) + 3600, 3600):
            if b not in present:
                want.append((et, b))
    assert len(want) > 0
    assert sorted(map(tuple, got[["event_type", "bar_start"]].itertuples(index=False))) == sorted(want)


def test_resample_ffill_matches_locf_replay():
    got = _oracle("q_resample_ffill").set_index(["user_id", "bar_start"])
    ev = _events().sort_values(["ts", "event_id"])
    ev["us"] = _ts_us(ev["ts"])
    checked = 0
    for uid, g in ev.groupby("user_id"):
        lo = math.ceil(g["us"].min() / 3_600_000_000)
        hi = math.floor(g["us"].max() / 3_600_000_000)
        for h in range(lo, hi + 1):
            cut = h * 3_600_000_000
            prior = g[g["us"] <= cut]
            assert not prior.empty  # grid starts at ceil(first tick)
            price = prior["value"].iloc[-1]
            assert abs(got.loc[(uid, cut // 1_000_000), "price"] - round(price, 2)) < 1e-9
            checked += 1
    assert checked == len(got) > 50


def test_win_obv_matches_cumulative_replay():
    got = _oracle("q_win_obv").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, user_id, ts, value, props FROM read_parquet('{SF}/events.parquet')"
    ).df().sort_values(["ts", "event_id"])
    pat = re.compile(r'"k":\s*([0-9]+)')
    checked = 0
    for _, g in ev.groupby("user_id"):
        obv, prev = 0, None
        for _, r in g.iterrows():
            m = pat.search(r["props"])
            vol = int(m.group(1)) if m else None
            if prev is not None and r["value"] > prev:
                obv += vol
            elif prev is not None and r["value"] < prev:
                obv -= vol
            assert int(got.loc[r["event_id"], "obv"]) == obv, r["event_id"]
            prev = r["value"]
            checked += 1
    assert checked == len(got) > 500


def test_candle_patterns_matches_flag_replay():
    got = _oracle("q_candle_patterns").set_index("event_type")
    ev = _events().sort_values(["ts", "event_id"])
    ev["day"] = ev["ts"].astype("datetime64[ns]").dt.floor("D")
    agg = {}
    for et, g in ev.groupby("event_type"):
        bars = []
        for day, b in g.groupby("day"):
            o, c = b["value"].iloc[0], b["value"].iloc[-1]
            h, lo = b["value"].max(), b["value"].min()
            bars.append((day, o, h, lo, c))
        bars.sort()
        doji = hammer = engulf = 0
        for i, (_, o, h, lo, c) in enumerate(bars):
            doji += abs(c - o) <= 0.1 * (h - lo)
            hammer += (min(o, c) - lo >= 2 * abs(c - o)) and (
                h - max(o, c) <= abs(c - o)
            )
            if i > 0:
                _, po, _, _, pc = bars[i - 1]
                engulf += pc < po and c > o and o <= pc and c >= po
        agg[et] = (doji, hammer, engulf, len(bars))
    assert len(agg) == len(got) > 2
    for et, (d, hm, e, n) in agg.items():
        row = got.loc[et]
        assert (
            int(row["n_doji"]), int(row["n_hammer"]),
            int(row["n_bull_engulf"]), int(row["n_bars"]),
        ) == (d, hm, e, n), et


def test_events_heatmap_matches_dow_hour_replay():
    got = _oracle("q_events_heatmap").set_index(["dow", "hour"])
    ev = _events()
    t = ev["ts"].astype("datetime64[ns]")
    # DuckDB dayofweek: 0=Sunday; oracle emits dayofweek+1 (1=Sunday)
    ev = ev.assign(dow=(t.dt.dayofweek + 1) % 7 + 1, hour=t.dt.hour)
    checked = 0
    for (dow, hour), g in ev.groupby(["dow", "hour"]):
        row = got.loc[(dow, hour)]
        assert int(row["n_events"]) == len(g)
        cents = int(np.floor(g["value"] * 100).sum())
        assert abs(row["volume"] - cents / 100.0) < 1e-9
        checked += 1
    assert checked == len(got) > 100


# ---------------------------------------------------------------------------
# r9 (second wave): replays for the window-builtin family — pandas
# re-derivations of frame semantics (running/rolling/range frames,
# rank variants, percent_rank/cume_dist). These guard against a
# shared misreading of frame bounds that both engines' texts would
# reproduce identically.
# ---------------------------------------------------------------------------


def test_win_running_matches_cumsum():
    got = _oracle("q_win_running").set_index("event_id")
    ev = _events().sort_values(["ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        run = 0.0
        for _, r in g.iterrows():
            run += r["value"]
            assert abs(got.loc[r["event_id"], "running_total"] - round(run, 2)) < 1e-9
            checked += 1
    assert checked == len(got) > 500


def test_win_rank_matches_rank_variants():
    got = _oracle("q_win_rank").set_index("c_custkey")
    cust = duckdb.connect().execute(
        f"SELECT c_custkey, c_nationkey, c_acctbal FROM read_parquet('{SF}/customer.parquet')"
    ).df()
    checked = 0
    for _, g in cust.groupby("c_nationkey"):
        g = g.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
        # rank()/dense_rank() peer on the FULL order key (verified
        # against DuckDB on a literal table): with the unique
        # c_custkey tiebreak no peers exist, so rank == dense_rank ==
        # row_number — the replay asserts exactly that collapse
        for i, (_, r) in enumerate(g.iterrows(), 1):
            row = got.loc[r["c_custkey"]]
            assert (int(row["rn"]), int(row["rnk"]), int(row["drnk"])) == (i, i, i)
            checked += 1
    assert checked == len(got) > 100


def test_win_lag_lead_matches_shift():
    got = _oracle("q_win_lag_lead").set_index("event_id")
    ev = _events().sort_values(["ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        v = g["value"].tolist()
        ids = g["event_id"].tolist()
        for i, eid in enumerate(ids):
            row = got.loc[eid]
            if i == 0:
                assert pd.isna(row["delta_prev"])
            else:
                assert abs(row["delta_prev"] - (v[i] - v[i - 1])) < 1e-12
            if i == len(ids) - 1:
                assert pd.isna(row["next_value"])
            else:
                assert row["next_value"] == v[i + 1]
            checked += 1
    assert checked == len(got) > 500


def test_win_moving_avg_matches_rolling_mean():
    got = _oracle("q_win_moving_avg").set_index("event_id")
    ev = _events().sort_values(["ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        v = g["value"].reset_index(drop=True)
        sma = v.rolling(7, min_periods=1).mean()
        for i, eid in enumerate(g["event_id"]):
            assert abs(got.loc[eid, "sma7"] - round(sma[i], 4)) < 1e-9
            checked += 1
    assert checked == len(got) > 500


def test_win_range_frame_matches_time_window_sum():
    got = _oracle("q_win_range_frame").set_index("event_id")
    ev = _events()
    ev["es"] = _ts_us(ev["ts"]) // 1_000_000
    checked = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["es", "event_id"])
        for _, r in g.iterrows():
            # RANGE frame: every row whose epoch_s is within [t-3600, t],
            # INCLUDING peers sorting after the current row
            win = g[(g["es"] >= r["es"] - 3600) & (g["es"] <= r["es"])]
            assert abs(
                got.loc[r["event_id"], "vol_1h"] - round(win["value"].sum(), 2)
            ) < 2e-2
            checked += 1
    assert checked == len(got) > 500


def test_win_first_last_matches_partition_endpoints():
    got = _oracle("q_win_first_last").set_index("event_id")
    ev = _events().sort_values(["ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        first, last = g["value"].iloc[0], g["value"].iloc[-1]
        for eid in g["event_id"]:
            row = got.loc[eid]
            assert row["open_value"] == first and row["close_value"] == last
            checked += 1
    assert checked == len(got) > 500


def test_win_pct_matches_textbook_formulas():
    got = _oracle("q_win_pct").set_index("c_custkey")
    cust = duckdb.connect().execute(
        f"SELECT c_custkey, c_nationkey, c_acctbal FROM read_parquet('{SF}/customer.parquet')"
    ).df()
    checked = 0
    for _, g in cust.groupby("c_nationkey"):
        g = g.sort_values(["c_acctbal", "c_custkey"])
        n = len(g)
        for i, (_, r) in enumerate(g.iterrows(), 1):
            # percent_rank/cume_dist peer on the FULL order key
            # (verified vs DuckDB): the unique c_custkey tiebreak
            # makes every row its own peer group, so
            # percent_rank = (i-1)/(n-1) and cume_dist = i/n exactly
            pr = 0.0 if n == 1 else (i - 1) / (n - 1)
            cume = i / n
            row = got.loc[r["c_custkey"]]
            assert abs(row["pct_rank"] - round(pr, 6)) < 1e-9
            assert abs(row["cume"] - round(cume, 6)) < 1e-9
            checked += 1
    assert checked == len(got) > 100


# ---------------------------------------------------------------------------
# r9 (third wave): replays for the scalar-builtin family. Python's
# stdlib (str/datetime/math/json/re) is a genuine THIRD implementation
# of these semantics — the wave pins indexing conventions (1-based
# substring/instr), rounding modes (round-half-away for doubles on
# both engines vs python's half-even), ISO week/dow conventions, and
# lateral-explode null rows.
# ---------------------------------------------------------------------------


def _cust(sf: str = SF) -> pd.DataFrame:
    return duckdb.connect().execute(
        f"SELECT c_custkey, c_name, c_mktsegment, c_nationkey, c_acctbal "
        f"FROM read_parquet('{sf}/customer.parquet')"
    ).df()


def _orders(sf: str = SF) -> pd.DataFrame:
    return duckdb.connect().execute(
        f"SELECT o_orderkey, o_orderdate, o_totalprice, o_orderstatus, "
        f"o_orderpriority, o_custkey FROM read_parquet('{sf}/orders.parquet')"
    ).df()


def _round_half_away(x: float) -> int:
    """Both engines round(double, 0) half AWAY from zero on the
    double's exact value (Spark HALF_UP via BigDecimal, DuckDB
    likewise); python round() is half-even, so the replay must not
    use it — and the earlier floor(x + 0.5) form misrounded doubles
    where x + 0.5 is inexact (0.49999999999999994 + 0.5 == 1.0 gives
    1; engines say 0 — ADVICE r10, pinned against DuckDB in
    test_round_half_away_helper_matches_duckdb). Decimal(x) is the
    EXACT binary value, so the tie test is exact; for integer
    rounding it is equivalent to the engines' shortest-repr
    BigDecimal (a double whose shortest repr ends in .5 IS exactly
    .5 by repr round-trip uniqueness)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def test_fn_string_matches_python_str():
    got = _oracle("q_fn_string").set_index("c_custkey")
    cust = _cust()
    assert len(got) == len(cust)
    tr = str.maketrans("AEIOU", "aeiou")
    for _, r in cust.iterrows():
        row = got.loc[r["c_custkey"]]
        name, seg = r["c_name"], r["c_mktsegment"]
        assert row["seg_up"] == seg.upper()
        assert row["name_lo"] == name.lower()
        assert row["name_pre"] == name[:8]  # substring is 1-based, len 8
        assert row["joined"] == seg + "|" + name
        assert int(row["name_len"]) == len(name)
        assert row["nat_pad"] == str(int(r["c_nationkey"])).rjust(4, "0")
        assert int(row["hash_pos"]) == name.find("#") + 1  # instr: 1-based, 0=absent
        m = re.search(r"([0-9]+)", name)
        assert int(row["name_num"]) == int(m.group(1))
        assert row["no_zeros"] == name.replace("0", "")
        assert row["trimmed"] == (" " + seg + " ").strip()
        assert row["seg_rev"] == seg[::-1]
        assert row["stars"] == "*" * (int(r["c_nationkey"]) % 4)
        assert row["seg_tr"] == seg.translate(tr)


def test_fn_date_matches_python_datetime():
    import calendar
    from datetime import date, timedelta

    got = _oracle("q_fn_date").set_index("o_orderkey")
    orders = _orders()
    assert len(got) == len(orders)
    base = date(1995, 1, 1)
    for _, r in orders.iterrows():
        d = pd.Timestamp(r["o_orderdate"]).date()
        row = got.loc[r["o_orderkey"]]
        assert (int(row["yr"]), int(row["mo"]), int(row["dy"])) == (d.year, d.month, d.day)
        assert int(row["qtr"]) == (d.month - 1) // 3 + 1
        # DuckDB dayofweek: 0 = Sunday; oracle emits +1 (1 = Sunday)
        assert int(row["dow"]) == (d.weekday() + 1) % 7 + 1
        assert row["month_start"] == d.replace(day=1).isoformat()
        assert row["plus30"] == (d + timedelta(days=30)).isoformat()
        last = d.replace(day=calendar.monthrange(d.year, d.month)[1])
        assert row["month_end"] == last.isoformat()
        assert int(row["days_since"]) == (d - base).days
        assert int(row["epoch_s"]) == (d - date(1970, 1, 1)).days * 86400


def test_fn_math_matches_python_math():
    got = _oracle("q_fn_math").set_index("p_partkey")
    part = duckdb.connect().execute(
        f"SELECT p_partkey, p_retailprice, p_size FROM read_parquet('{SF}/part.parquet')"
    ).df()
    assert len(got) == len(part)
    for _, r in part.iterrows():
        p, sz = float(r["p_retailprice"]), int(r["p_size"])
        row = got.loc[r["p_partkey"]]
        assert int(row["price_r0"]) == _round_half_away(p)  # .50 boundaries occur
        assert int(row["price_floor"]) == math.floor(p)
        assert int(row["price_ceil"]) == math.ceil(p)
        assert int(row["size_dev"]) == abs(sz - 25)
        assert abs(row["price_sqrt"] - round(math.sqrt(p), 6)) < 2e-6
        assert abs(row["price_ln"] - round(math.log(p), 6)) < 2e-6
        assert abs(row["price_log10"] - round(math.log10(p), 6)) < 2e-6
        assert abs(row["size_sq"] - sz * sz) < 1e-9
        assert int(row["size_pmod"]) == sz % 7
        assert int(row["size_sign"]) == (sz > 25) - (sz < 25)
        assert abs(row["size_exp"] - round(math.exp(sz / 100.0), 6)) < 2e-6


def test_fn_bitwise_matches_python_int_ops():
    got = _oracle("q_fn_bitwise").set_index("event_id")
    ev = _events()
    ev = ev[ev["event_id"] < 1000]
    assert len(got) == len(ev) > 0
    for _, r in ev.iterrows():
        u, e = int(r["user_id"]), int(r["event_id"])
        row = got.loc[e]
        assert int(row["and_mask"]) == u & 255
        assert int(row["or_set"]) == u | 4096
        assert int(row["xored"]) == u ^ e
        assert int(row["shifted"]) == u << 2
        assert int(row["popcount"]) == bin(u).count("1")


def _emb(sf: str = SF) -> pd.DataFrame:
    return duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet')"
    ).df()


def test_fn_array_matches_python_list_ops():
    got = _oracle("q_fn_array").set_index("vec_id")
    emb = _emb()
    assert len(got) == len(emb)
    for _, r in emb.iterrows():
        v = [float(x) for x in r["embedding"]]
        row = got.loc[r["vec_id"]]
        assert int(row["dim"]) == len(v)
        assert abs(row["e2"] - v[1]) < 1e-9  # [2] is 1-based
        assert abs(row["vec_sum"] - round(sum(v), 4)) < 1e-3
        assert abs(row["head_sum"] - round(sum(v[:8]), 4)) < 1e-3  # [1:8] inclusive
        assert abs(row["vec_min"] - round(min(v), 6)) < 1e-9
        assert int(row["n_pos"]) == sum(1 for x in v if x > 0)
        assert abs(row["doubled_sum"] - round(sum(x * 2.0 for x in v), 4)) < 1e-3


def test_fn_explode_matches_parallel_unnest():
    got = _oracle("q_fn_explode")
    emb = _emb()
    want = []
    for _, r in emb.iterrows():
        v = [float(x) for x in r["embedding"][:4]]
        want += [(int(r["vec_id"]), pos, v[pos]) for pos in range(4)]
    have = sorted(map(tuple, got[["vec_id", "pos", "val"]].itertuples(index=False)))
    want = sorted(want)
    assert len(have) == len(want) > 0
    for (hv, hp, hx), (wv, wp, wx) in zip(have, want):
        assert (hv, hp) == (wv, wp) and abs(hx - wx) < 1e-9


def test_fn_json_and_regexp_match_python_re():
    import json as _json

    got_j = _oracle("q_fn_json").set_index("event_id")
    got_r = _oracle("q_fn_regexp").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, props FROM read_parquet('{SF}/events.parquet')"
    ).df()
    kpat = re.compile(r'"k":\s*([0-9]+)')
    assert len(got_j) == len(ev) == len(got_r)
    for _, r in ev.iterrows():
        props = r["props"]
        k = kpat.search(props).group(1)
        rj = got_j.loc[r["event_id"]]
        assert int(rj["k_str"]) == int(k) == int(rj["k_typed"])
        assert rj["rebuilt"] == '{"k":' + k + "}"
        rr = got_r.loc[r["event_id"]]
        assert rr["k_str"] == k
        assert int(rr["n_digit_runs"]) == len(re.findall(r"[0-9]+", props))
        assert int(rr["k_multi_digit"]) == int(bool(re.search(r'"k":\s*[0-9]{2,}', props)))
        assert rr["masked"] == re.sub(r"[0-9]", "#", props)
        # cross-check the regex read against a real JSON parse
        assert _json.loads(props)["k"] == int(k)


def test_fn_cast_matches_python_formatting():
    got = _oracle("q_fn_cast").set_index("o_orderkey")
    orders = _orders()
    assert len(got) == len(orders)
    for _, r in orders.iterrows():
        k, p = int(r["o_orderkey"]), float(r["o_totalprice"])
        row = got.loc[k]
        assert row["price_dec"] == f"{p:.2f}"
        assert int(row["price_long"]) == math.floor(p)
        assert row["key_str"] == str(k)
        assert row["ts_parsed"] == "1996-06-15 00:00:00"
        assert int(row["roundtrip"]) == k


def test_fn_url_matches_string_build():
    got = _oracle("q_fn_url").set_index("doc_id")
    docs = duckdb.connect().execute(
        f"SELECT doc_id, source, lang FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    assert len(got) == len(docs)
    for _, r in docs.iterrows():
        row = got.loc[r["doc_id"]]
        d = int(r["doc_id"])
        assert row["url"] == f"https://{r['source']}.example.com/docs/{d}?lang={r['lang']}"
        assert row["host"] == f"{r['source']}.example.com"
        assert row["path"] == f"/docs/{d}"
        assert row["lang_param"] == r["lang"]


def test_fn_explode_outer_keeps_empty_docs():
    got = _oracle("q_fn_explode_outer")
    docs = _docs()
    want = []
    for _, r in docs.iterrows():
        toks = [t for t in r["text"].split(" ") if len(t) > 5]
        if toks:
            want += [(int(r["doc_id"]), t) for t in toks]
        else:
            want.append((int(r["doc_id"]), None))  # outer: row survives
    have = sorted(
        (int(a), b if pd.notna(b) else None)
        for a, b in got[["doc_id", "tok"]].itertuples(index=False)
    )
    assert have == sorted(want, key=lambda t: (t[0], t[1] or ""))
    assert any(t is None for _, t in have), "fixture lacks an all-short doc"


def test_fn_try_matches_python_fallbacks():
    import json as _json

    got = _oracle("q_fn_try").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, event_type, value, props FROM read_parquet('{SF}/events.parquet')"
    ).df()
    assert len(got) == len(ev)
    for _, r in ev.iterrows():
        e = int(r["event_id"])
        row = got.loc[e]
        assert int(row["k_num"]) == _json.loads(r["props"])["k"]
        assert pd.isna(row["type_as_num"])  # alphabetic, TRY_CAST -> NULL
        if e % 10 == 0:
            assert pd.isna(row["safe_div"])
        else:
            want = math.floor(r["value"] / (e % 10) * 10000) / 10000.0
            assert abs(row["safe_div"] - want) < 1e-9
        assert pd.isna(row["first_char_num"])


def test_fn_datetime_extra_matches_iso_conventions():
    import calendar
    from datetime import date, timedelta

    got = _oracle("q_fn_datetime_extra").set_index("o_orderkey")
    orders = _orders()
    assert len(got) == len(orders)
    for _, r in orders.iterrows():
        d = pd.Timestamp(r["o_orderdate"]).date()
        row = got.loc[r["o_orderkey"]]
        qs = date(d.year, (d.month - 1) // 3 * 3 + 1, 1)
        assert row["qtr_start"] == qs.isoformat()
        last = d.replace(day=calendar.monthrange(d.year, d.month)[1])
        assert row["month_end"] == last.isoformat()
        assert int(row["doy"]) == d.timetuple().tm_yday
        assert int(row["iso_week"]) == d.isocalendar().week
        assert int(row["months_since_1995"]) == (d.year - 1995) * 12 + d.month
        isodow = d.weekday() + 1  # Mon=1..Sun=7
        step = (8 - isodow) % 7 or 7
        assert row["next_monday"] == (d + timedelta(days=step)).isoformat()


def test_fn_struct_matches_json_dumps():
    import json as _json

    got = _oracle("q_fn_struct").set_index("o_orderkey")
    orders = _orders()
    assert len(got) == len(orders)
    n_f = 0
    for _, r in orders.iterrows():
        k = int(r["o_orderkey"])
        row = got.loc[k]
        want = _json.dumps(
            {"k": k, "st": r["o_orderstatus"], "pri": r["o_orderpriority"]},
            separators=(",", ":"),
        )
        assert row["order_json"] == want
        assert row["st_field"] == r["o_orderstatus"]
        assert int(row["is_f"]) == int(r["o_orderstatus"] == "F")
        n_f += row["is_f"]
    assert 0 < n_f < len(orders)


def test_fn_lambda_matches_python_fold():
    got = _oracle("q_fn_lambda").set_index("vec_id")
    emb = _emb()
    assert len(got) == len(emb)
    for _, r in emb.iterrows():
        v = [float(x) for x in r["embedding"]]
        n = len(v)
        row = got.loc[r["vec_id"]]
        dot_rev = sum(v[i] * v[n - 1 - i] for i in range(n))
        assert abs(row["dot_rev"] - round(dot_rev, 4)) < 1e-3
        assert bool(row["any_big"]) == any(x > 0.3 for x in v)
        assert bool(row["all_small"]) == all(abs(x) < 1.0 for x in v)
        assert int(row["idx_sum"]) == n * (n + 1) // 2


def test_tpch_q12_matches_pandas_join():
    got = _oracle("q_tpch_q12").set_index("shipmode")
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_orderkey, l_linestatus, l_shipdate FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    orders = _orders().set_index("o_orderkey")
    lo = pd.Timestamp("1996-01-01")
    hi = pd.Timestamp("1997-01-01")
    agg: dict[str, list[int]] = {}
    for _, r in li.iterrows():
        sd = pd.Timestamp(r["l_shipdate"])
        if not (lo <= sd < hi):
            continue
        o = orders.loc[int(r["l_orderkey"])]
        if sd <= pd.Timestamp(o["o_orderdate"]) + pd.Timedelta(days=30):
            continue
        a = agg.setdefault(r["l_linestatus"], [0, 0])
        a[int(o["o_orderpriority"] not in ("1-URGENT", "2-HIGH"))] += 1
    assert len(got) == len(agg) > 0
    for st, (hi_c, lo_c) in agg.items():
        row = got.loc[st]
        assert (int(row["high_line_count"]), int(row["low_line_count"])) == (hi_c, lo_c)


# ---------------------------------------------------------------------------
# r9 (fourth wave): replays for the subtle primitive compositions —
# super-aggregate null rows (ROLLUP/CUBE/GROUPING SETS), GROUPING()
# bit order, null-safe join keys, bag set-ops (EXCEPT/INTERSECT ALL),
# as-of variants, moment-based skew/kurtosis, interpolated quantiles.
# ---------------------------------------------------------------------------


def test_agg_rollup_matches_pandas_levels():
    got = _oracle("q_agg_rollup")
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT r_name, n_name, c_acctbal
            FROM read_parquet('{SF}/customer.parquet') c
            JOIN read_parquet('{SF}/nation.parquet') n ON c_nationkey = n_nationkey
            JOIN read_parquet('{SF}/region.parquet') r ON n_regionkey = r_regionkey"""
    ).df()
    want = {}
    for (rn, nn), g in df.groupby(["r_name", "n_name"]):
        want[(rn, nn)] = (len(g), round(g["c_acctbal"].sum(), 2))
    for rn, g in df.groupby("r_name"):  # level 1: (r_name, NULL)
        want[(rn, None)] = (len(g), round(g["c_acctbal"].sum(), 2))
    want[(None, None)] = (len(df), round(df["c_acctbal"].sum(), 2))
    assert len(got) == len(want)
    for _, r in got.iterrows():
        k = (
            r["r_name"] if pd.notna(r["r_name"]) else None,
            r["n_name"] if pd.notna(r["n_name"]) else None,
        )
        n, tot = want[k]
        assert int(r["n_customers"]) == n, k
        assert abs(r["total_bal"] - tot) < 2e-2, k


def test_agg_cube_matches_all_four_levels():
    got = _oracle("q_agg_cube")
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT c_mktsegment AS seg, o_orderpriority AS pri, o_totalprice AS p
            FROM read_parquet('{SF}/orders.parquet') o
            JOIN read_parquet('{SF}/customer.parquet') c ON o_custkey = c_custkey"""
    ).df()
    want = {}
    for (s, pr), g in df.groupby(["seg", "pri"]):
        want[(s, pr)] = (len(g), round(g["p"].sum(), 2))
    for s, g in df.groupby("seg"):
        want[(s, None)] = (len(g), round(g["p"].sum(), 2))
    for pr, g in df.groupby("pri"):
        want[(None, pr)] = (len(g), round(g["p"].sum(), 2))
    want[(None, None)] = (len(df), round(df["p"].sum(), 2))
    assert len(got) == len(want)
    for _, r in got.iterrows():
        k = (
            r["c_mktsegment"] if pd.notna(r["c_mktsegment"]) else None,
            r["o_orderpriority"] if pd.notna(r["o_orderpriority"]) else None,
        )
        n, tot = want[k]
        assert int(r["n_orders"]) == n, k
        assert abs(r["total"] - tot) < 0.5, k  # float-sum order at 2dp


def test_agg_grouping_sets_and_grouping_id():
    got = _oracle("q_agg_grouping_sets")
    li = duckdb.connect().execute(
        f"SELECT l_returnflag AS f, l_linestatus AS s, l_quantity AS q, "
        f"l_extendedprice AS p FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    want = {}
    for f, g in li.groupby("f"):
        want[(f, None)] = round(g["q"].sum(), 2)
    for s_, g in li.groupby("s"):
        want[(None, s_)] = round(g["q"].sum(), 2)
    want[(None, None)] = round(li["q"].sum(), 2)
    assert len(got) == len(want)
    for _, r in got.iterrows():
        k = (
            r["l_returnflag"] if pd.notna(r["l_returnflag"]) else None,
            r["l_linestatus"] if pd.notna(r["l_linestatus"]) else None,
        )
        assert abs(r["sum_qty"] - want[k]) < 1e-6, k

    # GROUPING() bit order: grouping(f)*2 + grouping(s) — a column
    # contributes its bit as 1 when it is AGGREGATED AWAY
    got2 = _oracle("q_agg_grouping_id")
    want2 = {}
    # the oracle floors AFTER the double sum (floor(sum(p) * 100)) —
    # NOT per row; the replay follows, with a 1-cent tolerance for
    # summation-order ulps at the floor boundary
    for (f, s_), g in li.groupby(["f", "s"]):
        want2[(f, s_, 0)] = (len(g), math.floor(g["p"].sum() * 100))
    for f, g in li.groupby("f"):
        want2[(f, None, 1)] = (len(g), math.floor(g["p"].sum() * 100))
    want2[(None, None, 3)] = (len(li), math.floor(li["p"].sum() * 100))
    assert len(got2) == len(want2)
    for _, r in got2.iterrows():
        k = (
            r["l_returnflag"] if pd.notna(r["l_returnflag"]) else None,
            r["l_linestatus"] if pd.notna(r["l_linestatus"]) else None,
            int(r["gid"]),
        )
        n, cents = want2[k]
        assert int(r["n"]) == n, k
        assert abs(int(r["revenue_cents"]) - cents) <= 100, k  # 1.00 slack on ~5e9


def test_join_null_safe_matches_null_equality():
    got = _oracle("q_join_null_safe")
    con = duckdb.connect()
    cust = con.execute(
        f"SELECT c_nationkey FROM read_parquet('{SF}/customer.parquet')"
    ).df()
    supp = con.execute(
        f"SELECT s_nationkey FROM read_parquet('{SF}/supplier.parquet')"
    ).df()
    def grp_counts(s):
        out: dict = {}
        for k in s:
            key = None if int(k) % 5 == 0 else int(k) % 5
            out[key] = out.get(key, 0) + 1
        return out
    cg = grp_counts(cust["c_nationkey"])
    sg = grp_counts(supp["s_nationkey"])
    # IS NOT DISTINCT FROM: NULL matches NULL (unlike =)
    want = {k: (cg[k], sg[k]) for k in cg if k in sg}
    assert len(got) == len(want)
    null_seen = False
    for _, r in got.iterrows():
        k = None if pd.isna(r["grp"]) else int(r["grp"])
        null_seen |= k is None
        assert (int(r["n_cust"]), int(r["n_supp"])) == want[k]
    assert null_seen, "NULL group must join NULL group"


def test_except_all_and_intersect_all_bag_semantics():
    li = duckdb.connect().execute(
        f"SELECT l_orderkey, l_partkey, l_linenumber, l_returnflag "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    from collections import Counter

    a = Counter(
        (int(r["l_orderkey"]), int(r["l_partkey"]))
        for _, r in li[li["l_linenumber"] <= 2].iterrows()
    )
    b = Counter(
        (int(r["l_orderkey"]), int(r["l_partkey"]))
        for _, r in li[li["l_returnflag"] == "R"].iterrows()
    )
    want_exc = a - b          # bag difference: multiplicities subtract
    want_int = a & b          # bag intersection: min multiplicity
    got_exc = Counter(
        map(tuple, _oracle("q_except_all")[["l_orderkey", "l_partkey"]].itertuples(index=False))
    )
    got_int = Counter(
        map(tuple, _oracle("q_intersect_all")[["l_orderkey", "l_partkey"]].itertuples(index=False))
    )
    assert got_exc == want_exc and sum(want_exc.values()) > 0
    assert got_int == want_int and sum(want_int.values()) > 0


def test_agg_weighted_median_matches_lower_median_rule():
    got = _oracle("q_agg_weighted_median").set_index("flag")
    li = duckdb.connect().execute(
        f"SELECT l_returnflag AS flag, l_extendedprice AS p, l_quantity AS q "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    for flag, g in li.groupby("flag"):
        pts = sorted(
            (int(math.floor(p * 100)), int(q)) for p, q in zip(g["p"], g["q"])
        )
        total = sum(w for _, w in pts)
        cw = 0
        for cents, w in pts:
            cw += w
            if 2 * cw >= total:
                med = cents / 100.0
                break
        row = got.loc[flag]
        assert abs(row["weighted_median"] - med) < 1e-9, flag
        assert int(row["total_weight"]) == total


def test_agg_mode_matches_counter_with_tiebreak():
    got = _oracle("q_agg_mode").set_index("l_returnflag")
    li = duckdb.connect().execute(
        f"SELECT l_returnflag, l_linestatus FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    for flag, g in li.groupby("l_returnflag"):
        counts = g["l_linestatus"].value_counts()
        best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        row = got.loc[flag]
        assert (row["mode_status"], int(row["cnt"])) == (best[0], int(best[1]))


def test_win_gaps_islands_matches_streak_scan():
    got = _oracle("q_win_gaps_islands")
    ev = _events().sort_values(["ts", "event_id"])
    want = []
    for uid, g in ev.groupby("user_id"):
        run_type, run_len, run_first = None, 0, None
        rows = list(g.itertuples())
        for i, r in enumerate(rows):
            if r.event_type != run_type:
                if run_len >= 3:
                    want.append((uid, run_type, run_len, run_first))
                run_type, run_len, run_first = r.event_type, 1, r.event_id
            else:
                run_len += 1
                run_first = min(run_first, r.event_id)
        if run_len >= 3:
            want.append((uid, run_type, run_len, run_first))
    have = sorted(
        map(tuple, got[["user_id", "event_type", "streak_len", "first_event"]].itertuples(index=False))
    )
    assert have == sorted(want) and len(want) > 0


def test_join_asof_tolerance_and_forward():
    got_t = _oracle("q_join_asof_tolerance").set_index("event_id")
    got_f = _oracle("q_join_asof_forward").set_index("event_id")
    ev = _events()
    ev["us"] = _ts_us(ev["ts"])
    want_t, want_f = {}, {}
    for _, g in ev.groupby("user_id"):
        views = g[g["event_type"] == "view"].sort_values(["us", "event_id"])
        for _, p in g[g["event_type"] == "purchase"].iterrows():
            back = views[(views["us"] <= p["us"]) & (p["us"] - views["us"] <= 3_600_000_000)]
            if len(back):
                b = back.sort_values(["us", "event_id"]).iloc[-1]
                want_t[p["event_id"]] = (int(b["event_id"]), b["value"])
            fwd = views[views["us"] > p["us"]]
            if len(fwd):
                b = fwd.iloc[0]
                want_f[p["event_id"]] = (
                    int(b["event_id"]), b["value"],
                    int(math.floor((b["us"] - p["us"]) / 1_000_000.0)),
                )
    assert len(got_t) == len(want_t) > 0
    for eid, (vid, vv) in want_t.items():
        row = got_t.loc[eid]
        assert (int(row["view_id"]), row["view_value"]) == (vid, vv)
    assert len(got_f) == len(want_f) > 0
    for eid, (vid, vv, ws) in want_f.items():
        row = got_f.loc[eid]
        assert (int(row["next_view_id"]), row["next_view_value"], int(row["wait_s"])) == (vid, vv, ws)


def test_agg_skew_kurt_matches_moment_formulas():
    got = _oracle("q_agg_skew_kurt").set_index("flag")
    li = duckdb.connect().execute(
        f"SELECT l_returnflag AS flag, l_extendedprice AS p "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    for flag, g in li.groupby("flag"):
        x = np.floor(g["p"] / 100).astype("int64").to_numpy()
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        skew = m3 / m2**1.5
        kurt = m4 / m2**2 - 3
        row = got.loc[flag]
        assert abs(row["skewness"] - skew) < 2e-4, flag
        assert abs(row["kurtosis_excess"] - kurt) < 2e-4, flag


def test_agg_argmax_matches_struct_max():
    got = _oracle("q_agg_argmax").set_index("event_type")
    ev = _events()
    ev["day"] = ev["ts"].astype("datetime64[ns]").dt.strftime("%Y-%m-%d")
    ev["di"] = _epoch_days(ev["ts"])
    for et, g in ev.groupby("event_type"):
        daily = g.groupby(["day", "di"]).apply(
            lambda s: int(np.floor(s["value"] * 100).sum()), include_groups=False
        )
        # max on (cents, -di): highest revenue, EARLIEST day on ties
        best = max(((c, -di, day) for (day, di), c in daily.items()))
        row = got.loc[et]
        assert row["peak_day"] == best[2], et
        assert abs(row["peak_revenue"] - best[0] / 100.0) < 1e-9, et


def test_agg_string_agg_matches_sorted_distinct():
    got = _oracle("q_agg_string_agg").set_index("o_orderpriority")
    orders = _orders()
    for pri, g in orders.groupby("o_orderpriority"):
        want = ",".join(sorted(set(g["o_orderstatus"])))
        row = got.loc[pri]
        assert row["statuses"] == want
        assert int(row["n_orders"]) == len(g)


def test_agg_percentile_matches_linear_interpolation():
    got = _oracle("q_agg_percentile").set_index("l_returnflag")
    li = duckdb.connect().execute(
        f"SELECT l_returnflag, l_extendedprice, l_quantity "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    for flag, g in li.groupby("l_returnflag"):
        row = got.loc[flag]
        assert abs(row["med_price"] - round(float(np.quantile(g["l_extendedprice"], 0.5)), 4)) < 1e-6
        assert abs(row["p95_price"] - round(float(np.quantile(g["l_extendedprice"], 0.95)), 4)) < 1e-6
        assert abs(row["p25_qty"] - round(float(np.quantile(g["l_quantity"], 0.25)), 4)) < 1e-6


def test_agg_histogram_matches_bucket_floor():
    got = _oracle("q_agg_histogram").set_index("bucket")
    ev = _events()
    ev["bucket"] = (np.floor(ev["value"] / 25.0) + 1).astype("int64")
    for b, g in ev.groupby("bucket"):
        row = got.loc[b]
        assert int(row["n"]) == len(g)
        assert abs(row["lo"] - round(g["value"].min(), 2)) < 1e-9
        assert abs(row["hi"] - round(g["value"].max(), 2)) < 1e-9


# ---------------------------------------------------------------------------
# r9 (fifth wave): replays for every remaining primitive-composition
# key — pandas merges/groupbys as the third derivation. With this
# wave, ALL relational keys carry an independent recompute; the
# differential-only set reduces to the three structural families
# (streaming equivalence, UDF plumbing, roundtrip identity).
# ---------------------------------------------------------------------------


def _li(sf: str = SF) -> pd.DataFrame:
    return duckdb.connect().execute(
        f"SELECT * FROM read_parquet('{sf}/lineitem.parquet')"
    ).df()


def test_agg_group_matches_q1_shape():
    got = _oracle("q_agg_group").set_index(["l_returnflag", "l_linestatus"])
    li = _li()
    li = li[pd.to_datetime(li["l_shipdate"]) <= pd.Timestamp("1998-09-02")]
    assert len(got) > 0
    for (f, s), g in li.groupby(["l_returnflag", "l_linestatus"]):
        row = got.loc[(f, s)]
        assert abs(row["sum_qty"] - round(g["l_quantity"].sum(), 2)) < 1e-6
        assert abs(row["sum_base_price"] - round(g["l_extendedprice"].sum(), 2)) < 0.02
        disc = int(np.floor(g["l_extendedprice"] * (1 - g["l_discount"]) * 100).sum())
        charge = int(
            np.floor(
                g["l_extendedprice"] * (1 - g["l_discount"]) * (1 + g["l_tax"]) * 100
            ).sum()
        )
        assert abs(row["sum_disc_price"] - disc / 100.0) < 1e-6
        assert abs(row["sum_charge"] - charge / 100.0) < 1e-6
        assert abs(row["avg_qty"] - round(g["l_quantity"].mean(), 2)) < 1e-6
        assert abs(row["avg_disc"] - round(g["l_discount"].mean(), 4)) < 1e-6
        assert int(row["count_order"]) == len(g)


def test_join_multiway_matches_merge_chain():
    got = _oracle("q_join_multiway").set_index(["r_name", "n_name"])
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT r_name, n_name, o_totalprice
            FROM read_parquet('{SF}/orders.parquet') o
            JOIN read_parquet('{SF}/customer.parquet') c ON o_custkey = c_custkey
            JOIN read_parquet('{SF}/nation.parquet') n ON c_nationkey = n_nationkey
            JOIN read_parquet('{SF}/region.parquet') r ON n_regionkey = r_regionkey"""
    ).df()
    # independent re-join in pandas from the four raw tables
    o = con.execute(f"SELECT o_custkey, o_totalprice FROM read_parquet('{SF}/orders.parquet')").df()
    c = con.execute(f"SELECT c_custkey, c_nationkey FROM read_parquet('{SF}/customer.parquet')").df()
    n = con.execute(f"SELECT n_nationkey, n_name, n_regionkey FROM read_parquet('{SF}/nation.parquet')").df()
    r = con.execute(f"SELECT r_regionkey, r_name FROM read_parquet('{SF}/region.parquet')").df()
    j = (
        o.merge(c, left_on="o_custkey", right_on="c_custkey")
        .merge(n, left_on="c_nationkey", right_on="n_nationkey")
        .merge(r, left_on="n_regionkey", right_on="r_regionkey")
    )
    assert len(j) == len(df)
    for (rn, nn), g in j.groupby(["r_name", "n_name"]):
        row = got.loc[(rn, nn)]
        assert abs(row["revenue"] - round(g["o_totalprice"].sum(), 2)) < 0.02
        assert int(row["n_orders"]) == len(g)


def test_topk_per_group_matches_sorted_head():
    got = _oracle("q_topk_per_group")
    orders = _orders()
    want = []
    for ck, g in orders.groupby("o_custkey"):
        g = g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        for i, (_, r) in enumerate(g.head(3).iterrows(), 1):
            want.append((int(ck), int(r["o_orderkey"]), float(r["o_totalprice"]), i))
    have = sorted(map(tuple, got[["o_custkey", "o_orderkey", "totalprice", "rank_in_cust"]].itertuples(index=False)))
    assert have == sorted(want)


def test_agg_pivot_and_pivot_dynamic_match_conditional_sums():
    ev = _events()
    for key in ("q_agg_pivot", "q_pivot_dynamic"):
        got = _oracle(key).set_index("user_id")
        assert len(got) == ev["user_id"].nunique()
        for uid, g in ev.groupby("user_id"):
            row = got.loc[uid]
            for et in ("click", "error", "purchase", "signup", "view"):
                sub = g[g["event_type"] == et]["value"]
                if sub.empty:
                    assert pd.isna(row[et]), (key, uid, et)
                else:
                    assert abs(row[et] - round(sub.sum(), 2)) < 1e-6, (key, uid, et)


def test_filter_date_matches_between():
    got = _oracle("q_filter_date")
    li = _li()
    sd = pd.to_datetime(li["l_shipdate"])
    sel = li[(sd >= pd.Timestamp("1996-01-01")) & (sd <= pd.Timestamp("1996-12-31"))]
    want = sorted(
        (int(r["l_orderkey"]), int(r["l_linenumber"]),
         pd.Timestamp(r["l_shipdate"]).date().isoformat())
        for _, r in sel.iterrows()
    )
    assert sorted(map(tuple, got[["l_orderkey", "l_linenumber", "ship_date"]].itertuples(index=False))) == want
    assert len(want) > 100


def test_case_when_matches_banding():
    got = _oracle("q_case_when").set_index("price_band")
    orders = _orders()
    bands = orders["o_totalprice"].map(
        lambda p: "high" if p > 300000 else ("mid" if p > 100000 else "low")
    )
    for band, g in orders.groupby(bands):
        row = got.loc[band]
        assert int(row["n_orders"]) == len(g)
        assert abs(row["total"] - round(g["o_totalprice"].sum(), 2)) < 0.02


def test_join_left_semi_anti_match_exists_logic():
    got_l = _oracle("q_join_left").set_index("c_custkey")
    got_s = set(_oracle("q_join_semi")["c_custkey"])
    got_a = set(_oracle("q_join_anti")["c_custkey"])
    cust = _cust()
    orders = _orders()
    by_cust = dict(tuple(orders.groupby("o_custkey")))
    urgent = set(orders[orders["o_orderpriority"] == "1-URGENT"]["o_custkey"].astype(int))
    assert len(got_l) == len(cust)
    for _, r in cust.iterrows():
        ck = int(r["c_custkey"])
        g = by_cust.get(ck)
        row = got_l.loc[ck]
        assert int(row["order_cnt"]) == (0 if g is None else len(g))
        tot = 0.0 if g is None else round(g["o_totalprice"].sum(), 2)
        assert abs(row["total_spent"] - tot) < 0.02
    want_s = {int(k) for k in cust["c_custkey"] if int(k) in urgent}
    assert got_s == want_s
    assert got_a == set(cust["c_custkey"].astype(int)) - want_s
    assert got_s and got_a  # both sides non-empty: semi ∪ anti = all


def test_join_outer_matches_full_merge():
    # sf0.01: at sf0.001 every surviving key sits on both sides, so
    # the outer legs would go unexercised
    got = _oracle("q_join_outer", SF01).set_index("custkey")
    cust = _cust(SF01)
    orders = _orders(SF01)
    neg = {int(r["c_custkey"]): float(r["c_acctbal"])
           for _, r in cust[cust["c_acctbal"] < 0].iterrows()}
    big = {
        int(ck): round(g["o_totalprice"].sum(), 2)
        for ck, g in orders[orders["o_totalprice"] > 300000].groupby("o_custkey")
    }
    keys = set(neg) | set(big)
    assert len(got) == len(keys)
    n_left_only = n_right_only = 0
    for k in keys:
        row = got.loc[k]
        if k in neg:
            assert abs(row["acctbal"] - neg[k]) < 1e-9
        else:
            assert pd.isna(row["acctbal"]); n_right_only += 1
        if k in big:
            assert abs(row["big_total"] - big[k]) < 0.02
        else:
            assert pd.isna(row["big_total"]); n_left_only += 1
    assert n_left_only and n_right_only  # both outer sides exercised


def test_join_theta_matches_inequality_pairs():
    # sf0.01: the 10 sf0.001 suppliers never share a nation
    got = _oracle("q_join_theta", SF01)
    supp = duckdb.connect().execute(
        f"SELECT s_suppkey, s_nationkey, s_acctbal FROM read_parquet('{SF01}/supplier.parquet')"
    ).df()
    want = []
    rows = list(supp.itertuples())
    for a in rows:
        for b in rows:
            if a.s_nationkey == b.s_nationkey and a.s_acctbal > b.s_acctbal:
                want.append((int(a.s_suppkey), int(b.s_suppkey), int(a.s_nationkey)))
    assert sorted(map(tuple, got[["a_suppkey", "b_suppkey", "nationkey"]].itertuples(index=False))) == sorted(want)
    assert len(want) > 0


def test_join_range_interval_matches_window_count():
    got = _oracle("q_join_range_interval").set_index("event_id")
    ev = _events()
    ev["us"] = _ts_us(ev["ts"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        clicks = g[g["event_type"] == "click"]["us"]
        for _, p in g[g["event_type"] == "purchase"].iterrows():
            n = int(((clicks >= p["us"] - 3_600_000_000) & (clicks < p["us"])).sum())
            assert int(got.loc[p["event_id"], "clicks_before"]) == n
            checked += 1
    assert checked == len(got) > 0


def test_agg_distinct_matches_nunique():
    got = _oracle("q_agg_distinct").set_index("l_returnflag")
    li = _li()
    for f, g in li.groupby("l_returnflag"):
        row = got.loc[f]
        assert int(row["supp_cnt"]) == g["l_suppkey"].nunique()
        assert int(row["part_cnt"]) == g["l_partkey"].nunique()
        assert abs(row["sum_dist_qty"] - round(g["l_quantity"].drop_duplicates().sum(), 2)) < 1e-6


def test_agg_stats_matches_numpy_ddof1():
    got = _oracle("q_agg_stats").set_index("l_linestatus")
    li = _li()
    for s, g in li.groupby("l_linestatus"):
        row = got.loc[s]
        assert abs(row["sd_price"] - round(g["l_extendedprice"].std(ddof=1), 2)) < 0.02
        assert abs(row["var_qty"] - round(g["l_quantity"].var(ddof=1), 2)) < 0.02
        r = np.corrcoef(g["l_extendedprice"], g["l_quantity"])[0, 1]
        assert abs(row["corr_pq"] - round(r, 4)) < 2e-4
        cov = np.cov(g["l_extendedprice"], g["l_discount"], ddof=1)[0, 1]
        assert abs(row["cov_pd"] - round(cov, 2)) < 0.05


def test_agg_having_matches_group_filter():
    got = _oracle("q_agg_having").set_index("o_custkey")
    orders = _orders()
    want = {}
    for ck, g in orders.groupby("o_custkey"):
        if len(g) >= 5 and g["o_totalprice"].sum() > 500000:
            want[int(ck)] = (len(g), round(g["o_totalprice"].sum(), 2))
    assert len(got) == len(want) > 0
    for ck, (n, tot) in want.items():
        row = got.loc[ck]
        assert int(row["n_orders"]) == n
        assert abs(row["total"] - tot) < 0.02


def test_set_ops_match_python_sets():
    from collections import Counter

    cust = _cust()
    supp = duckdb.connect().execute(
        f"SELECT s_suppkey, s_nationkey FROM read_parquet('{SF}/supplier.parquet')"
    ).df()
    ua = _oracle("q_union_all")
    want_ua = Counter(
        [(int(k), "customer") for k in cust["c_custkey"]]
        + [(int(k), "supplier") for k in supp["s_suppkey"]]
    )
    assert Counter(map(tuple, ua[["id", "src"]].itertuples(index=False))) == want_ua
    cn = set(cust["c_nationkey"].astype(int))
    sn = set(supp["s_nationkey"].astype(int))
    assert set(_oracle("q_union_distinct")["nationkey"].astype(int)) == cn | sn
    assert set(_oracle("q_intersect")["nationkey"].astype(int)) == cn & sn
    assert set(_oracle("q_except")["nationkey"].astype(int)) == cn - sn
    li = _li()
    want_d = set(zip(li["l_returnflag"], li["l_linestatus"]))
    assert set(map(tuple, _oracle("q_distinct").itertuples(index=False))) == want_d


def test_agg_collect_matches_sorted_distinct_join():
    got = _oracle("q_agg_collect").set_index("n_name")
    con = duckdb.connect()
    df = con.execute(
        f"""SELECT n_name, c_mktsegment FROM read_parquet('{SF}/customer.parquet') c
            JOIN read_parquet('{SF}/nation.parquet') n ON c_nationkey = n_nationkey"""
    ).df()
    for nn, g in df.groupby("n_name"):
        row = got.loc[nn]
        assert row["segments"] == ",".join(sorted(set(g["c_mktsegment"])))
        assert int(row["n_customers"]) == len(g)


def test_unpivot_matches_stacked_columns():
    got = _oracle("q_unpivot")
    li = _li()
    li = li[li["l_linenumber"] == 1]
    want = []
    for _, r in li.iterrows():
        k = (int(r["l_orderkey"]), 1)
        want += [
            (*k, "quantity", float(r["l_quantity"])),
            (*k, "extendedprice", float(r["l_extendedprice"])),
            (*k, "tax", float(r["l_tax"])),
        ]
    have = sorted(map(tuple, got[["l_orderkey", "l_linenumber", "metric", "metric_value"]].itertuples(index=False)))
    assert have == sorted(want)


def test_agg_filter_matches_conditional_aggs():
    got = _oracle("q_agg_filter").set_index("l_returnflag")
    li = _li()
    for f, g in li.groupby("l_returnflag"):
        row = got.loc[f]
        assert int(row["n_bulk"]) == int((g["l_quantity"] > 25).sum())
        rev = g[g["l_discount"] > 0.05]["l_extendedprice"].sum()
        assert abs(row["discounted_rev"] - round(rev, 2)) < 0.02
        assert int(row["n_total"]) == len(g)


def test_win_nth_value_matches_running_third():
    got = _oracle("q_win_nth_value").set_index("event_id")
    ev = _events().sort_values(["ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        vals = g["value"].tolist()
        for i, eid in enumerate(g["event_id"]):
            row = got.loc[eid]
            if i < 2:
                assert pd.isna(row["third_seen"])
            else:
                assert row["third_seen"] == vals[2]
            checked += 1
    assert checked == len(got) > 500


def test_basket_pairs_matches_pair_counts():
    got = _oracle("q_basket_pairs")
    li = _li()[["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import Counter

    pairs: Counter = Counter()
    for _, g in li.groupby("l_orderkey"):
        ps = sorted(set(g["l_partkey"].astype(int)))
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs[(ps[i], ps[j])] += 1
    want = {k: v for k, v in pairs.items() if v >= 2}
    have = {
        (int(a), int(b)): int(n)
        for a, b, n in got[["part_a", "part_b", "n_orders"]].itertuples(index=False)
    }
    assert have == want and len(want) > 0


def test_source_python_matches_knuth_formula():
    got = _oracle("q_source_python").set_index("tick_id")
    assert len(got) == 20000
    for i in (0, 1, 7, 8191, 19999):
        assert int(got.loc[i, "bucket"]) == i % 8
        assert int(got.loc[i, "value_cents"]) == ((i * 2654435761) % 2**32) % 10007


def test_join_asof_nearest_matches_two_sided_rule():
    got = _oracle("q_join_asof_nearest").set_index("event_id")
    ev = _events()
    ev = ev[ev["event_type"].isin(["view", "purchase"])].copy()
    ev["us"] = _ts_us(ev["ts"])
    want = {}
    for _, g in ev.groupby("user_id"):
        # sort exactly as the window does: views before purchases at
        # equal ts (a view at the same instant counts as PREV, gap 0)
        g = g.assign(is_p=(g["event_type"] == "purchase").astype(int))
        g = g.sort_values(["us", "is_p", "event_id"]).reset_index(drop=True)
        for idx, r in g.iterrows():
            if r["event_type"] != "purchase":
                continue
            prev = next_ = None
            for j in range(idx - 1, -1, -1):
                if g.loc[j, "event_type"] == "view":
                    prev = (int(g.loc[j, "event_id"]), int(g.loc[j, "us"]))
                    break
            for j in range(idx + 1, len(g)):
                if g.loc[j, "event_type"] == "view":
                    next_ = (int(g.loc[j, "event_id"]), int(g.loc[j, "us"]))
                    break
            if prev is None and next_ is None:
                continue
            t = int(r["us"])
            if next_ is None or (prev is not None and abs(next_[1] - t) >= abs(prev[1] - t)):
                vid = prev[0]  # ties go to prev
            else:
                vid = next_[0]
            gap = min(
                abs(prev[1] - t) if prev else 2**63 - 1,
                abs(next_[1] - t) if next_ else 2**63 - 1,
            )
            want[int(r["event_id"])] = (vid, gap // 1_000_000)
    assert len(got) == len(want) > 0
    for eid, (vid, gap) in want.items():
        row = got.loc[eid]
        assert (int(row["view_id"]), int(row["gap_s"])) == (vid, gap), eid


def test_agg_bitmap_distinct_matches_nunique():
    got = _oracle("q_agg_bitmap_distinct").set_index("o_orderpriority")
    orders = _orders()
    for pri, g in orders.groupby("o_orderpriority"):
        assert int(got.loc[pri, "n_customers"]) == g["o_custkey"].nunique()


# ---------------------------------------------------------------------------
# r9 (audit closure): three rows claimed "recompute: test_recompute.py"
# without a test here — q_fn_map was missed in the scalar wave, and
# q_topk / q_join_interval_overlap carried the claim since the r8
# inventory without a matching replay. The claim-vs-file audit that
# found them is now itself a test (below), so a dangling claim can
# never ship again.
# ---------------------------------------------------------------------------


def test_fn_map_matches_constant_projection():
    got = _oracle("q_fn_map").set_index("event_id")
    ev = _events()
    assert len(got) == len(ev)
    for _, r in ev.iterrows():
        row = got.loc[r["event_id"]]
        assert row["et"] == r["event_type"]
        assert int(row["m_size"]) == 2
        assert row["keys_csv"] == "et,src"
        assert row["vals_csv"] == r["event_type"] + ",app"


def test_topk_matches_sorted_head():
    got = _oracle("q_topk")
    orders = _orders()
    want = [
        (int(r["o_orderkey"]), float(r["o_totalprice"]))
        for _, r in orders.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True]
        ).head(10).iterrows()
    ]
    assert list(map(tuple, got[["o_orderkey", "totalprice"]].itertuples(index=False))) == want


def test_join_interval_overlap_matches_week_windows():
    got = _oracle("q_join_interval_overlap")
    orders = _orders()
    want = []
    for ck, g in orders.groupby("o_custkey"):
        iv = sorted(
            (int(r["o_orderkey"]), pd.Timestamp(r["o_orderdate"]).date())
            for _, r in g.iterrows()
        )
        for i in range(len(iv)):
            for j in range(len(iv)):
                a_key, a0 = iv[i]
                b_key, b0 = iv[j]
                if a_key >= b_key:
                    continue
                a1 = a0 + pd.Timedelta(days=6).to_pytimedelta()
                b1 = b0 + pd.Timedelta(days=6).to_pytimedelta()
                if a0 <= b1 and b0 <= a1:
                    ov = (min(a1, b1) - max(a0, b0)).days + 1
                    want.append((int(ck), a_key, b_key, ov))
    have = sorted(map(tuple, got[["custkey", "a_key", "b_key", "overlap_days"]].itertuples(index=False)))
    assert have == sorted(want) and len(want) > 0


def test_tokenize_matches_python_re_tokenizer():
    got = _oracle("q_tokenize").set_index("doc_id")
    docs = _docs()
    pat = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    assert len(got) == len(docs)
    for _, r in docs.iterrows():
        toks = pat.findall(r["text"])
        row = got.loc[r["doc_id"]]
        assert int(row["n_subtokens"]) == len(toks)
        assert int(row["n_words"]) == sum(1 for t in toks if t.isalpha() and t.isascii())
        assert int(row["n_numbers"]) == sum(1 for t in toks if t.isdigit() and t.isascii())
        assert int(row["n_whitespace_tokens"]) == len(r["text"].split(" "))


def test_funnel_matches_staged_min_times():
    got = _oracle("q_funnel").set_index("stage")
    ev = _events()
    ev["us"] = _ts_us(ev["ts"])
    s1 = s2 = s3 = 0
    for _, g in ev.groupby("user_id"):
        sign = g[g["event_type"] == "signup"]["us"]
        if sign.empty:
            continue
        s1 += 1
        t1 = sign.min()
        clicks = g[(g["event_type"] == "click") & (g["us"] > t1)]["us"]
        if clicks.empty:
            continue
        s2 += 1
        t2 = clicks.min()
        if ((g["event_type"] == "purchase") & (g["us"] > t2)).any():
            s3 += 1
    assert (int(got.loc["1_signup", "n_users"]),
            int(got.loc["2_click", "n_users"]),
            int(got.loc["3_purchase", "n_users"])) == (s1, s2, s3)
    assert s1 >= s2 >= s3 and s1 > 0


def test_drawdown_matches_running_peak():
    got = _oracle("q_drawdown").set_index("event_id")
    ev = _events().sort_values(["ts", "event_id"])
    checked = 0
    for _, g in ev.groupby("user_id"):
        peak = -math.inf
        for _, r in g.iterrows():
            peak = max(peak, r["value"])
            row = got.loc[r["event_id"]]
            assert abs(row["peak"] - round(peak, 2)) < 1e-9
            assert abs(row["drawdown"] - round(r["value"] / peak - 1.0, 4)) < 1e-9
            checked += 1
    assert checked == len(got) > 500


def test_seasonality_matches_dow_index():
    got = _oracle("q_seasonality").set_index(["event_type", "dow"])
    ev = _events()
    t = ev["ts"].astype("datetime64[ns]")
    ev = ev.assign(day=t.dt.floor("D"), dow=(t.dt.dayofweek + 1) % 7 + 1)
    for et, g in ev.groupby("event_type"):
        daily = g.groupby(["day", "dow"]).apply(
            lambda s: int(np.floor(s["value"] * 100).sum()), include_groups=False
        )
        tot_days, tot_cents = len(daily), int(daily.sum())
        for dow in sorted({d for _, d in daily.index}):
            vals = [c for (_, dw), c in daily.items() if dw == dow]
            n, s_ = len(vals), sum(vals)
            row = got.loc[(et, dow)]
            assert int(row["n_days"]) == n
            assert abs(row["avg_daily"] - math.floor(s_ / n) / 100.0) < 1e-9
            idx = (s_ / n) / (tot_cents / tot_days)
            assert abs(row["seasonal_idx"] - round(idx, 4)) < 1e-6


def test_fn_hash_matches_hashlib():
    got = _oracle("q_fn_hash").set_index("c_custkey")
    cust = _cust()
    assert len(got) == len(cust)
    for _, r in cust.iterrows():
        row = got.loc[r["c_custkey"]]
        assert row["name_md5"] == hashlib.md5(r["c_name"].encode()).hexdigest()
        rec = r["c_name"] + "|" + r["c_mktsegment"]
        assert row["rec_sha"] == hashlib.sha256(rec.encode()).hexdigest()


# ---------------------------------------------------------------------------
# r9 (streaming formulas): the streaming keys' independent check is
# stream-vs-batch equivalence by construction, but three of them also
# carry real FORMULAS (z-score, lower-median, traffic share) whose
# shared text could be misread on both engines — replay those from
# the raw fixture. The keys stay classified streaming-differential;
# these pin the formula layer specifically.
# ---------------------------------------------------------------------------


def test_stream_anomaly_formula_matches_numpy():
    got = _oracle("q_stream_anomaly")
    ev = _events()
    ev["win"] = _ts_us(ev["ts"]) // 3_600_000_000 * 3600
    rows = {}
    for et, g in ev.groupby("event_type"):
        counts = g.groupby("win").size()
        if len(counts) <= 1:
            continue
        n_wins = len(counts)
        mean = counts.sum() / n_wins
        sd = math.sqrt((np.sum(counts.to_numpy() ** 2) - counts.sum() ** 2 / n_wins) / (n_wins - 1))
        for w, n in counts.items():
            z = (n - mean) / sd
            rows[(et, int(w))] = (int(n), round(z, 4), int(abs(z) > 2.0))
    assert len(got) == len(rows) > 0
    for _, r in got.iterrows():
        n, z, flag = rows[(r["event_type"], int(r["win_start"]))]
        assert int(r["n"]) == n
        assert abs(r["z"] - z) < 1e-6
        assert int(r["is_anomaly"]) == flag


def test_stream_median_formula_matches_histogram_rule():
    got = _oracle("q_stream_median").set_index(["win_start", "event_type"])
    ev = _events()
    ev["win"] = _ts_us(ev["ts"]) // 3_600_000_000 * 3600
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    checked = 0
    for (w, et), g in ev.groupby(["win", "event_type"]):
        hist = g.groupby("cents").size().sort_index()
        total = int(hist.sum())
        cum = 0
        for cents, k in hist.items():
            cum += int(k)
            if 2 * cum >= total:
                med = cents / 100.0
                break
        row = got.loc[(int(w), et)]
        assert int(row["n"]) == total
        assert abs(row["median_value"] - round(med, 2)) < 1e-9
        checked += 1
    assert checked == len(got) > 50


def test_stream_pipeline_formula_matches_share_and_distinct():
    got = _oracle("q_stream_pipeline").set_index(["event_type", "day"])
    ev = _events()
    ev["day"] = ev["ts"].astype("datetime64[ns]").dt.strftime("%Y-%m-%d")
    counts = ev.groupby("event_type").size()
    tot = counts.sum()
    checked = 0
    for (et, day), g in ev.groupby(["event_type", "day"]):
        n_users = g.drop_duplicates(["user_id"])["user_id"].nunique()
        row = got.loc[(et, day)]
        assert int(row["n_users"]) == n_users
        assert abs(row["type_share"] - round(counts[et] / tot, 6)) < 1e-9
        checked += 1
    assert checked == len(got) > 10


def test_udf_pandas_agg_formula_matches_weighted_mean():
    """q_udf_pandas_agg's contract is the Arrow grouped-agg surface,
    but its formula (quantity-weighted mean price) is worth its own
    pin — the UDF body and the SQL must both mean Σpq/Σq."""
    got = _oracle("q_udf_pandas_agg").set_index("l_returnflag")
    li = _li()
    for f, g in li.groupby("l_returnflag"):
        w = (g["l_extendedprice"] * g["l_quantity"]).sum() / g["l_quantity"].sum()
        assert abs(got.loc[f, "wavg_price"] - w) < 1e-6, f


def test_udf_grouped_map_formula_matches_group_zscore():
    """q_udf_grouped_map's formula layer: per-nation z-score with the
    SAMPLE stddev (ddof=1) and the sd==0 -> 0.0 guard."""
    got = _oracle("q_udf_grouped_map").set_index("c_custkey")
    cust = _cust()
    checked = 0
    for _, g in cust.groupby("c_nationkey"):
        mu = g["c_acctbal"].mean()
        sd = g["c_acctbal"].std(ddof=1)
        for _, r in g.iterrows():
            z = 0.0 if not sd or sd != sd else (r["c_acctbal"] - mu) / sd
            assert abs(got.loc[r["c_custkey"], "z_score"] - z) < 1e-9
            checked += 1
    assert checked == len(got) > 100


# --- r10 wave: formula-bearing keys converted contract -> recompute ---


def _half_away(x: float, nd: int) -> float:
    """DuckDB/Spark round() is half-AWAY-from-zero ON THE SCALED
    DOUBLE PRODUCT; python round() is half-even — replicate the
    engines' form. Two subtleties, both pinned against DuckDB's own
    round() in test_half_away_helper_matches_duckdb_round:
    - the x*10^nd multiply stays FLOATING POINT on purpose — its
      rounding is part of the engine semantics (2.675 rounds UP at
      2 dp because 2.675*100 lands exactly on the double 267.5, while
      1.275 rounds DOWN because 127.499…*1 stays below 127.5), so an
      exact-decimal reference like Decimal(repr(x)) disagrees with
      the engines on thousands of grid points;
    - the tie decision on that product must be EXACT — the earlier
      floor(v + 0.5) form misrounded products one ulp below a tie
      (0.049999999999999996 at nd=1: v + 0.5 == 1.0 inexactly, the
      engines say 0 — ADVICE r10), so the half-away step now runs on
      Decimal(v), the product's exact binary value."""
    from decimal import ROUND_HALF_UP, Decimal

    scale = 10**nd
    v = x * scale if x >= 0 else -x * scale
    r = int(Decimal(v).quantize(Decimal(1), rounding=ROUND_HALF_UP))
    return r / scale if x >= 0 else -r / scale


def test_stats_chisq_matches_contingency_recompute():
    """q_stats_chisq: Pearson chi-squared over the orders
    (priority x status) contingency table — expected counts from the
    marginals, per-cell (o-e)^2/e quantized to the 1e-6 grid before
    the sum (both engines share that text; this replay derives it
    from the raw fixture)."""
    got = _oracle("q_stats_chisq")
    od = duckdb.connect().execute(
        f"SELECT o_orderpriority AS pri, o_orderstatus AS st "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    cell = od.groupby(["pri", "st"]).size()
    n = int(cell.sum())
    row = cell.groupby(level=0).sum()
    col = cell.groupby(level=1).sum()
    qsum = 0
    for (p, s), o in cell.items():
        e = float(row[p]) * float(col[s]) / n
        qsum += math.floor((o - e) ** 2 / e * 1_000_000)
    r, c = od["pri"].nunique(), od["st"].nunique()
    assert int(got["dof"].iloc[0]) == (r - 1) * (c - 1)
    assert int(got["n"].iloc[0]) == n
    assert abs(got["chi2"].iloc[0] - qsum / 1e6) < 1e-3


def test_text_bm25_matches_okapi_recompute():
    """q_text_bm25: Okapi BM25 (k1=1.2, b=0.75 — the oracle's
    tf*2.2/(tf+1.2*(0.25+0.75*dl/avgdl)) is the k1-factored form)
    with the +1-smoothed idf, then top-5 docs per query term by
    (rounded score desc, doc_id asc)."""
    got = _oracle("q_text_bm25")
    docs = _docs()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    terms = ["join", "vector", "dup"]
    expect = []
    for term in terms:
        scored = []
        for d, t in toks.items():
            tf = t.count(term)
            if tf == 0:
                continue
            scored.append((d, tf, len(t)))
        dfreq = len(scored)
        rows = []
        for d, tf, dl in scored:
            idf = math.log((n_docs - dfreq + 0.5) / (dfreq + 0.5) + 1)
            s = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
            rows.append((term, d, _half_away(s, 4)))
        rows.sort(key=lambda x: (-x[2], x[1]))
        expect.extend(rows[:5])
    got_rows = sorted(map(tuple, got[["term", "doc_id", "bm25"]].values.tolist()))
    assert sorted(expect) == got_rows


def test_text_perplexity_matches_unigram_nll_recompute():
    """q_text_perplexity: corpus-level unigram LM, per-doc mean
    negative log-likelihood over [a-z]+ tokens of the lowered text."""
    got = _oracle("q_text_perplexity").set_index("doc_id")
    docs = _docs()
    toks = {r.doc_id: re.findall(r"[a-z]+", r.text.lower()) for r in docs.itertuples()}
    freq: dict = {}
    for t in toks.values():
        for w in t:
            freq[w] = freq.get(w, 0) + 1
    n = sum(freq.values())
    checked = 0
    for d, t in toks.items():
        if not t:
            assert d not in got.index
            continue
        nll = -sum(math.log(freq[w] / n) for w in t) / len(t)
        assert int(got.loc[d, "n_tokens"]) == len(t)
        assert abs(got.loc[d, "nll_per_token"] - nll) < 1e-3, d
        checked += 1
    assert checked == len(got) > 10


def test_twap_matches_interval_weighted_mean():
    """q_twap: per-user time-weighted average price — each value
    holds until the user's NEXT event (ts, event_id order); the last
    event carries no interval and is excluded."""
    got = _oracle("q_twap").set_index("user_id")
    ev = duckdb.connect().execute(
        f"SELECT user_id, value, event_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    checked = 0
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"]).reset_index(drop=True)
        if len(g) < 2:
            assert u not in got.index
            continue
        dur = g["us"].shift(-1) - g["us"]
        w = dur[:-1]
        v = g["value"][:-1]
        twap = float((v * w).sum() / w.sum())
        assert int(got.loc[u, "n_intervals"]) == len(g) - 1
        assert abs(got.loc[u, "twap"] - twap) < 1e-3, u
        checked += 1
    assert checked == len(got) > 5


def test_benford_matches_first_digit_law():
    """q_benford: first significant digit of the cents quantity vs
    the Benford expectation log10(1 + 1/d)."""
    got = _oracle("q_benford").set_index("digit")
    ev = _events()
    cents = (ev.loc[ev["value"] >= 0.01, "value"] * 100).apply(math.floor)
    digits = cents.astype(int).astype(str).str[0].astype(int)
    counts = digits.value_counts()
    total = int(counts.sum())
    assert len(got) == len(counts)
    for d, n in counts.items():
        assert int(got.loc[d, "n"]) == int(n)
        assert abs(got.loc[d, "observed"] - n / total) < 1e-3
        assert abs(got.loc[d, "benford_expected"] - math.log10(1 + 1 / d)) < 1e-3
        assert abs(got.loc[d, "deviation"] - (n / total - math.log10(1 + 1 / d))) < 2e-3


def _bm25_two_term(docs: pd.DataFrame) -> dict:
    """Shared replay helper: the oracle's two-term ('join','vector')
    BM25 sum per doc (k1=1.2, b=0.75, +1-smoothed idf), rounded 4."""
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    tf = {
        d: (t.count("join"), t.count("vector"), len(t))
        for d, t in toks.items()
        if t.count("join") or t.count("vector")
    }
    df_j = sum(1 for v in tf.values() if v[0] > 0)
    df_v = sum(1 for v in tf.values() if v[1] > 0)
    out = {}
    for d, (tj, tv, dl) in tf.items():
        norm = 1.2 * (0.25 + 0.75 * dl / avgdl)
        s = 0.0
        if tj:
            s += math.log((n_docs - df_j + 0.5) / (df_j + 0.5) + 1) * tj * 2.2 / (tj + norm)
        if tv:
            s += math.log((n_docs - df_v + 0.5) / (df_v + 0.5) + 1) * tv * 2.2 / (tv + norm)
        out[d] = _half_away(s, 4)
    return out


def test_sim_hybrid_rrf_matches_rank_fusion():
    """q_sim_hybrid_rrf: reciprocal-rank fusion (k=60) of the lexical
    BM25 ranking and the cosine ranking against query vector 0, top
    20 each, fused top 10 by (rrf desc, doc_id)."""
    got = _oracle("q_sim_hybrid_rrf")
    docs = _docs()
    lex = _bm25_two_term(docs)
    lrank = {
        d: i + 1
        for i, (d, _) in enumerate(
            sorted(lex.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    emb = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), dtype=float) for r in emb.itertuples()}
    q = vecs[0]
    nq = math.sqrt(float((q * q).sum()))
    cos = {
        v: _half_away(float((x * q).sum()) / (math.sqrt(float((x * x).sum())) * nq), 6)
        for v, x in vecs.items()
        if v != 0
    }
    vrank = {
        v: i + 1
        for i, (v, _) in enumerate(
            sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    ids = {d for d, r in lrank.items() if r <= 20} | {v for v, r in vrank.items() if r <= 20}
    fused = {
        i: _half_away(
            (1.0 / (60 + lrank[i]) if lrank.get(i, 99) <= 20 else 0.0)
            + (1.0 / (60 + vrank[i]) if vrank.get(i, 99) <= 20 else 0.0),
            6,
        )
        for i in ids
    }
    expect = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got_rows = [(int(r.doc_id), r.rrf) for r in got.itertuples()]
    assert [(d, pytest.approx(s, abs=2e-6)) for d, s in expect] == got_rows


def test_win_atr_matches_wilder_true_range():
    """q_win_atr: daily OHLC bars per event_type, true range =
    greatest(h-l, |h-prev_close|, |l-prev_close|) (NULL-skipping
    greatest on day 1), 14-day rolling mean."""
    got = _oracle("q_win_atr")
    ev = duckdb.connect().execute(
        f"SELECT event_type, value, event_id, epoch_us(ts) AS us, "
        f"strftime(date_trunc('day', ts), '%Y-%m-%d') AS day "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    gmap = {
        (r.event_type, r.day): r.atr14
        for r in got.itertuples()
    }
    checked = 0
    for et, g in ev.groupby("event_type"):
        bars = []
        for day, b in sorted(g.groupby("day"), key=lambda kv: kv[0]):
            b = b.sort_values(["us", "event_id"])
            bars.append((day, b["value"].max(), b["value"].min(), b["value"].iloc[-1]))
        trs = []
        prev_close = None
        for day, hi, lo, close in bars:
            cands = [hi - lo]
            if prev_close is not None:
                cands += [abs(hi - prev_close), abs(lo - prev_close)]
            trs.append((day, max(cands)))
            prev_close = close
        for i, (day, _) in enumerate(trs):
            atr = sum(t for _, t in trs[max(0, i - 13): i + 1]) / len(trs[max(0, i - 13): i + 1])
            assert abs(gmap[(et, day)] - atr) < 1e-3, (et, day)
            checked += 1
    assert checked == len(got) > 10


def test_win_rolling_median_matches_pandas_rolling():
    """q_win_rolling_median: 10-row trailing median per user in
    (ts, event_id) order (even windows average the middle pair)."""
    got = _oracle("q_win_rolling_median").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, user_id, value, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    checked = 0
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"]).reset_index(drop=True)
        med = g["value"].rolling(10, min_periods=1).median()
        for eid, m in zip(g["event_id"], med):
            assert abs(got.loc[eid, "med10"] - m) < 1e-3, eid
            checked += 1
    assert checked == len(got) > 100


def test_resample_interpolate_matches_linear_replay():
    """q_resample_interpolate: per-user hourly grid over the user's
    event span, linearly interpolated between the surrounding events
    (exact-hit grid points take the last event value at that
    instant)."""
    got = _oracle("q_resample_interpolate")
    gmap = {(int(r.user_id), int(r.bar_start)): r.price for r in got.itertuples()}
    ev = duckdb.connect().execute(
        f"SELECT user_id, value, event_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    HR = 3_600_000_000
    checked = 0
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"]).reset_index(drop=True)
        us = g["us"].to_numpy()
        val = g["value"].to_numpy()
        lo = math.ceil(us.min() / HR)
        hi = math.floor(us.max() / HR)
        for h in range(lo, hi + 1):
            t = h * HR
            at_or_before = np.nonzero(us <= t)[0]
            ip = at_or_before[-1]
            tp, vp = int(us[ip]), float(val[ip])
            if t == tp:
                price = vp
            else:
                inext = np.nonzero(us > t)[0][0]
                tn, vn = int(us[inext]), float(val[inext])
                price = vp + (vn - vp) * (t - tp) / (tn - tp)
            assert abs(gmap[(int(u), t // 1_000_000)] - price) < 1e-3, (u, h)
            checked += 1
    assert checked == len(got) > 10


def _md5_mod(prefix: str, key, mod: int) -> int:
    h = hashlib.md5(f"{prefix}{key}".encode()).hexdigest()[:8]
    return int(h, 16) % mod


def test_sample_temperature_matches_md5_gate_replay():
    """q_sample_temperature: per-language sqrt(n_min/n) keep rate,
    gated by md5('temp:'||doc_id)%10000 — exact set replay."""
    got = _oracle("q_sample_temperature")
    docs = _docs()
    counts = docs["lang"].value_counts()
    n_min = int(counts.min())
    keep = set()
    for r in docs.itertuples():
        rate = math.sqrt(n_min / counts[r.lang])
        if _md5_mod("temp:", r.doc_id, 10_000) < math.floor(rate * 10_000):
            keep.add((r.doc_id, r.lang))
    assert set(map(tuple, got[["doc_id", "lang"]].values.tolist())) == keep
    assert 0 < len(keep) < len(docs)


def test_sample_importance_matches_md5_gate_replay():
    """q_sample_importance: length-proportional keep probability
    n_chars/wmax, gated by md5('imp:'||doc_id)%100 — exact replay."""
    got = _oracle("q_sample_importance")
    docs = duckdb.connect().execute(
        f"SELECT doc_id, source, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    wmax = int(docs["n_chars"].max())
    keep = {
        (r.doc_id, r.source, r.n_chars)
        for r in docs.itertuples()
        if _md5_mod("imp:", r.doc_id, 100) * wmax < 100 * r.n_chars
    }
    assert set(map(tuple, got[["doc_id", "source", "n_chars"]].values.tolist())) == keep
    assert 0 < len(keep) < len(docs)


def test_text_tfidf_matches_definition_replay():
    """q_text_tfidf: tf * ln(N/df) over whitespace tokens, top 2 terms
    per doc_id < 20 (ties only at exactly-equal (tf, df), broken by
    term asc)."""
    got = _oracle("q_text_tfidf")
    docs = _docs()
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}
    total = len(toks)
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    expect = []
    for d, t in toks.items():
        if d >= 20:
            continue
        tf: dict = {}
        for w in t:
            tf[w] = tf.get(w, 0) + 1
        scored = sorted(
            ((w, c * math.log(total / df[w])) for w, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )[:2]
        for rnk, (w, s) in enumerate(scored, 1):
            expect.append((d, w, rnk, s))
    got_rows = sorted(map(tuple, got[["doc_id", "term", "rnk", "tfidf"]].values.tolist()))
    expect.sort()
    assert len(expect) == len(got_rows)
    for (d, w, rnk, s), (gd, gw, grnk, gs) in zip(expect, got_rows):
        assert (d, w, rnk) == (gd, gw, grnk)
        assert abs(s - gs) < 1e-3


def test_user_overlap_matches_set_jaccard():
    """q_user_overlap: pairwise Jaccard of the per-type user sets."""
    got = _oracle("q_user_overlap")
    ev = _events()
    sets = {t: set(g["user_id"]) for t, g in ev.groupby("event_type")}
    types = sorted(sets)
    expect = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            common = len(sets[a] & sets[b])
            if common:
                j = common / (len(sets[a]) + len(sets[b]) - common)
                expect.append((a, b, common, j))
    assert len(expect) == len(got)
    for (a, b, nc, j), r in zip(expect, got.itertuples()):
        assert (a, b, nc) == (r.type_a, r.type_b, r.n_common)
        assert abs(j - r.jaccard) < 1e-3


def test_concurrency_matches_interval_sweep():
    """q_concurrency: 30-min-gap sessions per user become (+1, -1)
    boundary events; the running sum in (us, delta desc, user_id)
    order is the concurrent-session count."""
    got = _oracle("q_concurrency")
    ev = duckdb.connect().execute(
        f"SELECT event_id, user_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    GAP = 1_800_000_000
    bounds = []
    for u, g in ev.groupby("user_id"):
        us = g.sort_values(["us", "event_id"])["us"].tolist()
        s_us = us[0]
        prev = us[0]
        for t in us[1:]:
            if t - prev > GAP:
                bounds += [(s_us, u, 1), (prev, u, -1)]
                s_us = t
            prev = t
        bounds += [(s_us, u, 1), (prev, u, -1)]
    bounds.sort(key=lambda r: (r[0], -r[2], r[1]))
    run, expect = 0, []
    for us, u, d in bounds:
        run += d
        expect.append((us, u, d, run))
    got_rows = list(map(tuple, got[["us", "user_id", "delta", "concurrent"]].values.tolist()))
    assert expect == got_rows
    assert max(r[3] for r in expect) > 1


def test_skyline_matches_pareto_dominance():
    """q_skyline: the (min price, min size) Pareto frontier of part —
    a part survives iff no other part is <= on both axes and < on
    one (replayed by brute-force dominance, not the oracle's
    running-min form)."""
    got = _oracle("q_skyline")
    pts = duckdb.connect().execute(
        f"SELECT p_partkey, CAST(floor(p_retailprice * 100) AS BIGINT) AS cents, "
        f"p_size FROM read_parquet('{SF}/part.parquet')"
    ).df()
    arr = pts[["cents", "p_size"]].to_numpy()
    keep = []
    for r in pts.itertuples():
        dominated = (
            ((arr[:, 0] <= r.cents) & (arr[:, 1] < r.p_size))
            | ((arr[:, 0] < r.cents) & (arr[:, 1] <= r.p_size))
        ).any()
        if not dominated:
            keep.append((r.p_partkey, r.cents / 100.0, r.p_size))
    keep.sort(key=lambda x: (x[1], x[0]))
    got_rows = list(map(tuple, got[["p_partkey", "price", "p_size"]].values.tolist()))
    assert keep == got_rows
    assert 0 < len(keep) < len(pts)


def test_text_collocations_matches_bigram_pmi():
    """q_text_collocations: adjacent-token bigram PMI
    ln(c_xy * t^2 / (b * c_x * c_y)) with support >= 5, top 20 by
    (rounded pmi desc, w1, w2)."""
    got = _oracle("q_text_collocations")
    docs = _docs()
    uni: dict = {}
    bi: dict = {}
    for r in docs.itertuples():
        t = r.text.split(" ")
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    t_tot = sum(uni.values())
    b_tot = sum(bi.values())
    scored = [
        (w1, w2, c, _half_away(math.log(c * t_tot * t_tot / (b_tot * uni[w1] * uni[w2])), 4))
        for (w1, w2), c in bi.items()
        if c >= 5
    ]
    scored.sort(key=lambda r: (-r[3], r[0], r[1]))
    expect = scored[:20]
    got_rows = list(map(tuple, got[["w1", "w2", "cxy", "pmi"]].values.tolist()))
    assert len(expect) == len(got_rows)
    for (w1, w2, c, p), (gw1, gw2, gc, gp) in zip(expect, got_rows):
        assert (w1, w2, c) == (gw1, gw2, gc)
        assert abs(p - gp) < 2e-4


def test_text_hapax_matches_vocab_counts():
    """q_text_hapax: vocabulary size, hapax-legomenon count/ratio and
    corpus token total over [a-z]+ tokens."""
    got = _oracle("q_text_hapax")
    docs = _docs()
    freq: dict = {}
    for r in docs.itertuples():
        for w in re.findall(r"[a-z]+", r.text.lower()):
            freq[w] = freq.get(w, 0) + 1
    hapax = sum(1 for c in freq.values() if c == 1)
    assert int(got["vocab"].iloc[0]) == len(freq)
    assert int(got["n_hapax"].iloc[0]) == hapax
    assert int(got["corpus_tokens"].iloc[0]) == sum(freq.values())
    assert abs(got["hapax_ratio"].iloc[0] - hapax / len(freq)) < 1e-3


def test_graph_triangles_matches_bruteforce_enumeration():
    """q_graph_triangles: per-node triangle incidence on the
    co-purchase graph (edges = part pairs sharing >= 2 orders),
    replayed by brute-force set intersection over adjacency."""
    got = _oracle("q_graph_triangles")
    li = duckdb.connect().execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    from collections import defaultdict

    order_parts = defaultdict(set)
    for r in li.itertuples():
        order_parts[r.l_orderkey].add(r.l_partkey)
    pair_count: dict = defaultdict(int)
    for parts in order_parts.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair_count[(a, b)] += 1
    adj = defaultdict(set)
    for (a, b), c in pair_count.items():
        if c >= 2:
            adj[a].add(b)
            adj[b].add(a)
    tri = defaultdict(int)
    for a in adj:
        for b in adj[a]:
            if b <= a:
                continue
            for c in adj[a] & adj[b]:
                if c > b:
                    for n in (a, b, c):
                        tri[n] += 1
    expect = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got_rows = [(int(r.node), int(r.n_triangles)) for r in got.itertuples()]
    assert expect == got_rows
    assert len(expect) > 0


def test_rolling_active_users_matches_window_sets():
    """q_rolling_active_users: DAU and trailing-7-day WAU (distinct
    users active in [day-6, day]) with DAU/WAU stickiness."""
    got = _oracle("q_rolling_active_users")
    daily = duckdb.connect().execute(
        f"SELECT DISTINCT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    import datetime

    by_day: dict = {}
    for r in daily.itertuples():
        by_day.setdefault(datetime.date.fromisoformat(r.day), set()).add(r.user_id)
    days = sorted(by_day)
    checked = 0
    for r in got.itertuples():
        d = datetime.date.fromisoformat(r.day)
        dau = len(by_day[d])
        wau_set = set()
        for k in range(7):
            wau_set |= by_day.get(d - datetime.timedelta(days=k), set())
        assert r.dau == dau and r.wau == len(wau_set), r.day
        assert abs(r.stickiness - dau / len(wau_set)) < 1e-3
        checked += 1
    assert checked == len(got) == len(days)


def test_event_paths_matches_transition_counts():
    """q_event_paths: per-user consecutive event-type transition
    counts in (ts, event_id) order."""
    got = _oracle("q_event_paths")
    ev = duckdb.connect().execute(
        f"SELECT user_id, event_type, event_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    from collections import Counter

    trans: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        seq = g.sort_values(["us", "event_id"])["event_type"].tolist()
        for a, b in zip(seq, seq[1:]):
            trans[(a, b)] += 1
    got_map = {(r.prev_type, r.next_type): int(r.n) for r in got.itertuples()}
    assert got_map == dict(trans)


def test_session_paths_matches_sequence_replay():
    """q_session_paths: 30-min-gap sessions, path = first 8 event
    types '>'-joined (DuckDB list_slice is 1-based INCLUSIVE, so
    [1:8] is exactly 8 elements), top 20 by (count desc, path)."""
    got = _oracle("q_session_paths")
    ev = duckdb.connect().execute(
        f"SELECT user_id, event_type, event_id, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    from collections import Counter

    GAP = 1_800_000_000
    paths: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        cur: list = []
        prev = None
        for r in g.itertuples():
            if prev is not None and r.us - prev > GAP:
                paths[">".join(cur[:8])] += 1
                cur = []
            cur.append(r.event_type)
            prev = r.us
        paths[">".join(cur[:8])] += 1
    expect = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got_rows = [(r.path, int(r.n_sessions)) for r in got.itertuples()]
    assert expect == got_rows


def test_funnel_windowed_matches_three_level_replay():
    """q_funnel_windowed: signup -> click -> purchase inside 24 h of
    the first signup, each level strictly after the previous."""
    got = _oracle("q_funnel_windowed")
    ev = duckdb.connect().execute(
        f"SELECT user_id, event_type, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    DAY = 24 * 3_600_000_000
    t0 = ev[ev.event_type == "signup"].groupby("user_id")["us"].min()
    n1 = len(t0)
    t1 = {}
    for r in ev[ev.event_type == "click"].itertuples():
        z = t0.get(r.user_id)
        if z is not None and z < r.us <= z + DAY:
            t1[r.user_id] = min(t1.get(r.user_id, r.us), r.us)
    t2 = {}
    for r in ev[ev.event_type == "purchase"].itertuples():
        z, o = t0.get(r.user_id), t1.get(r.user_id)
        if z is not None and o is not None and r.us > o and r.us <= z + DAY:
            t2[r.user_id] = min(t2.get(r.user_id, r.us), r.us)
    assert (int(got["n_level1"].iloc[0]), int(got["n_level2"].iloc[0]),
            int(got["n_level3"].iloc[0])) == (n1, len(t1), len(t2))
    assert n1 >= len(t1) >= len(t2) and n1 > 0


def test_text_keywords_matches_quantized_tfidf():
    """q_text_keywords: per-doc top-3 [a-z]+ tokens by tf-idf
    quantized to the 1e-6 grid (ties by token asc)."""
    got = _oracle("q_text_keywords")
    docs = _docs()
    toks = {r.doc_id: re.findall(r"[a-z]+", r.text.lower()) for r in docs.itertuples()}
    n_docs = len(docs)
    df: dict = {}
    for t in toks.values():
        for w in set(t):
            df[w] = df.get(w, 0) + 1
    expect = []
    for d, t in toks.items():
        if not t:
            continue
        tf: dict = {}
        for w in t:
            tf[w] = tf.get(w, 0) + 1
        # tf*ln(n/df) >= 0 always (df <= n_docs), so half-away == +0.5-floor
        scored = sorted(
            ((w, math.floor(c * math.log(n_docs / df[w]) * 1e6 + 0.5)) for w, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )
        for w, q in scored[:3]:
            expect.append((d, w, q / 1e6))
    got_rows = sorted(map(tuple, got[["doc_id", "keyword", "tfidf"]].values.tolist()))
    expect.sort()
    assert len(expect) == len(got_rows)
    for (d, w, s), (gd, gw, gs) in zip(expect, got_rows):
        assert (d, w) == (gd, gw), (d, w, gd, gw)
        assert abs(s - gs) < 2e-6


def test_text_boilerplate_matches_shingle_df_replay():
    """q_text_boilerplate: 5-token shingles (w[i:i+4] is 1-based
    INCLUSIVE = 5 tokens) over docs with >= 5 whitespace tokens;
    shingles seen in >= 10 docs are boilerplate; per-doc fraction."""
    got = _oracle("q_text_boilerplate").set_index("doc_id")
    docs = _docs()
    grams: dict = {}
    for r in docs.itertuples():
        w = r.text.split(" ")
        if len(w) < 5:
            continue
        grams[r.doc_id] = [" ".join(w[i: i + 5]) for i in range(len(w) - 4)]
    from collections import Counter

    df: Counter = Counter()
    for gs in grams.values():
        df.update(set(gs))
    common = {g for g, c in df.items() if c >= 10}
    checked = 0
    for d, gs in grams.items():
        nc = sum(1 for g in gs if g in common)
        assert int(got.loc[d, "n_grams"]) == len(gs), d
        assert int(got.loc[d, "n_common"]) == nc, d
        assert abs(got.loc[d, "boilerplate_frac"] - nc / len(gs)) < 1e-3
        checked += 1
    assert checked == len(got) > 10


def test_sample_reservoir_matches_hash_order_top100():
    """q_sample_reservoir: deterministic reservoir — the 100 docs
    with the smallest md5('res:'||doc_id) hex key (doc_id tiebreak)."""
    got = _oracle("q_sample_reservoir")
    docs = _docs()
    keyed = sorted(
        (hashlib.md5(f"res:{r.doc_id}".encode()).hexdigest(), r.doc_id, r.lang)
        for r in docs.itertuples()
    )[:100]
    expect = [(d, lang) for _, d, lang in keyed]
    got_rows = list(map(tuple, got[["doc_id", "lang"]].values.tolist()))
    assert expect == got_rows


def test_sample_stratified_matches_md5_rates():
    """q_sample_stratified: md5 bucket %100 with per-stratum keep
    thresholds (en 10%, others 40%) — exact set replay."""
    got = _oracle("q_sample_stratified")
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, source FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    expect = set()
    for r in docs.itertuples():
        b = _md5_mod("sample:", r.doc_id, 100)
        if b < (10 if r.lang == "en" else 40):
            expect.add((r.doc_id, r.lang, r.source, b))
    assert set(map(tuple, got[["doc_id", "lang", "source", "bucket"]].values.tolist())) == expect
    assert 0 < len(expect) < len(docs)


def test_split_hash_matches_content_addressed_buckets():
    """q_split_hash: 80/10/10 train/val/test split content-addressed
    on md5('split:'||text) — exact per-doc replay."""
    got = _oracle("q_split_hash").set_index("doc_id")
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, source, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    for r in docs.itertuples():
        b = int(hashlib.md5(f"split:{r.text}".encode()).hexdigest()[:8], 16) % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        assert int(got.loc[r.doc_id, "bucket"]) == b
        assert got.loc[r.doc_id, "split"] == split
    assert len(got) == len(docs)


def test_sessionize_matches_gap_replay():
    """q_sessionize: 30-min-gap sessions with per-session bounds,
    event count and rounded value total."""
    got = _oracle("q_sessionize")
    gmap = {
        (int(r.user_id), int(r.session_id)):
            (int(r.session_start_us), int(r.session_end_us), int(r.n_events), r.total_value)
        for r in got.itertuples()
    }
    ev = duckdb.connect().execute(
        f"SELECT user_id, event_id, value, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    GAP = 1_800_000_000
    checked = 0
    for u, g in ev.groupby("user_id"):
        g = g.sort_values(["us", "event_id"])
        sid, cur = 0, []
        prev = None
        def flush(sid, cur):
            us = [r.us for r in cur]
            vals = sum(r.value for r in cur)
            assert gmap[(int(u), sid)][:3] == (min(us), max(us), len(cur))
            assert abs(gmap[(int(u), sid)][3] - vals) < 1e-2 + 1e-9
        for r in g.itertuples():
            if prev is not None and r.us - prev > GAP:
                flush(sid, cur)
                checked += 1
                cur = []
            if not cur:
                sid += 1
            cur.append(r)
            prev = r.us
        flush(sid, cur)
        checked += 1
    assert checked == len(got) > 10


def test_pack_sequences_matches_cumulative_packing():
    """q_pack_sequences: doc_id-ordered greedy packing into 512-token
    sequences per source (seq_id = tokens-before // 512)."""
    got = _oracle("q_pack_sequences")
    gmap = {
        (r.source, int(r.seq_id)): (int(r.n_docs), int(r.seq_tokens), int(r.first_doc))
        for r in got.itertuples()
    }
    docs = duckdb.connect().execute(
        f"SELECT source, doc_id, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    from collections import defaultdict

    expect: dict = defaultdict(lambda: [0, 0, None])
    for src, g in docs.groupby("source"):
        cum = 0
        for r in g.sort_values("doc_id").itertuples():
            toks = len(r.text.split(" "))
            sid = cum // 512
            e = expect[(src, sid)]
            e[0] += 1
            e[1] += toks
            e[2] = r.doc_id if e[2] is None else min(e[2], r.doc_id)
            cum += toks
    assert {k: tuple(v) for k, v in expect.items()} == gmap


def test_doc_chunk_matches_stride_windows():
    """q_doc_chunk: 32-token chunks at stride 24 (1-based-inclusive
    slice = python w[start:start+32]), empty docs get one chunk."""
    got = _oracle("q_doc_chunk")
    gmap = {
        (int(r.doc_id), int(r.start)): (r.chunk_text, int(r.n_tokens))
        for r in got.itertuples()
    }
    docs = _docs()
    expect = {}
    for r in docs.itertuples():
        w = r.text.split(" ")
        for start in range(0, max(len(w), 1), 24):
            chunk = w[start: start + 32]
            expect[(r.doc_id, start)] = (" ".join(chunk), len(chunk))
    assert expect == gmap


def _lev_banded(a: str, b: str, k: int):
    """Banded Levenshtein with cutoff: exact distance if <= k, else
    None (the classic k-band DP)."""
    if abs(len(a) - len(b)) > k:
        return None
    if len(a) > len(b):
        a, b = b, a
    prev = {j: j for j in range(0, min(k, len(b)) + 1)}
    for i in range(1, len(a) + 1):
        cur = {}
        lo, hi = max(1, i - k), min(len(b), i + k)
        if i - k <= 0:
            cur[0] = i
        for j in range(lo, hi + 1):
            best = min(
                prev.get(j, k + 1) + 1,
                cur.get(j - 1, k + 1) + 1,
                prev.get(j - 1, k + 1) + (a[i - 1] != b[j - 1]),
            )
            cur[j] = best
        prev = cur
        if min(prev.values()) > k:
            return None
    d = prev.get(len(b), k + 1)
    return d if d <= k else None


def test_dedup_edit_matches_bruteforce_levenshtein():
    """q_dedup_edit: same-lang near-duplicate pairs at edit distance
    <= 8 — brute-forced over all rep pairs with |len diff| <= 8, which
    also proves the oracle's 16-char length blocking loses no pair
    (band [len-8, len+8] spans at most two adjacent blocks)."""
    got = _oracle("q_dedup_edit")
    docs = _docs()
    reps: dict = {}
    for r in docs.itertuples():
        key = (r.lang, r.text)
        if key not in reps or r.doc_id < reps[key]:
            reps[key] = r.doc_id
    by_lang: dict = {}
    for (lang, text), rid in reps.items():
        by_lang.setdefault(lang, []).append((rid, text))
    expect = set()
    for lang, items in by_lang.items():
        for i, (ra, ta) in enumerate(items):
            for rb, tb in items[i + 1:]:
                if abs(len(ta) - len(tb)) > 8:
                    continue
                d = _lev_banded(ta, tb, 8)
                if d is not None:
                    expect.add((min(ra, rb), max(ra, rb), d))
    got_rows = set(map(tuple, got[["doc_a", "doc_b", "dist"]].values.tolist()))
    assert got_rows == expect


def test_sim_range_matches_cosine_threshold():
    """q_sim_range: all vectors with cosine >= 0.3 against query
    vector 0."""
    got = _oracle("q_sim_range").set_index("vec_id")
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    vecs = {int(r.vec_id): (r.label, np.asarray(list(r.embedding), dtype=float)) for r in emb.itertuples()}
    _, q = vecs[0]
    nq = math.sqrt(float((q * q).sum()))
    expect = {}
    for v, (lab, x) in vecs.items():
        if v == 0:
            continue
        c = float((x * q).sum()) / (math.sqrt(float((x * x).sum())) * nq)
        if c >= 0.3:
            expect[v] = (lab, c)
    assert set(expect) == set(got.index)
    for v, (lab, c) in expect.items():
        assert got.loc[v, "label"] == lab
        assert abs(got.loc[v, "cosine"] - c) < 1e-3
    assert 0 < len(expect) < len(vecs) - 1


def test_basket_rules_matches_support_confidence_lift():
    """q_basket_rules: association rules over order baskets —
    confidence c_ab/c_a and lift c_ab*N/(c_a*c_b) at support >= 3,
    top 25 by (lift desc, part_a, part_b)."""
    got = _oracle("q_basket_rules")
    li = duckdb.connect().execute(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    from collections import Counter, defaultdict

    baskets = defaultdict(set)
    for r in li.itertuples():
        baskets[r.l_orderkey].add(r.l_partkey)
    n_orders = len(baskets)
    item: Counter = Counter()
    pair: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        item.update(ps)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair[(a, b)] += 1
    scored = [
        (a, b, c, c / item[a], c * n_orders / (item[a] * item[b]))
        for (a, b), c in pair.items()
        if c >= 3
    ]
    scored.sort(key=lambda r: (-r[4], r[0], r[1]))
    expect = scored[:25]
    got_rows = list(map(tuple, got[["part_a", "part_b", "c_ab", "confidence", "lift"]].values.tolist()))
    assert len(expect) == len(got_rows)
    for (a, b, c, conf, lift), (ga, gb, gc, gconf, glift) in zip(expect, got_rows):
        assert (a, b, c) == (ga, gb, gc)
        assert abs(conf - gconf) < 1e-5 and abs(lift - glift) < 1e-5


def test_join_asof_matches_latest_view_replay():
    """q_join_asof: for each purchase, the user's latest view at or
    before it (ties by event_id desc)."""
    got = _oracle("q_join_asof").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    views = {
        u: sorted(((r.us, r.event_id, r.value) for r in g.itertuples()))
        for u, g in ev[ev.event_type == "view"].groupby("user_id")
    }
    checked = 0
    for r in ev[ev.event_type == "purchase"].itertuples():
        cand = [v for v in views.get(r.user_id, []) if v[0] <= r.us]
        if not cand:
            assert r.event_id not in got.index
            continue
        _, vid, vval = max(cand)
        assert int(got.loc[r.event_id, "view_id"]) == vid
        assert got.loc[r.event_id, "view_value"] == vval
        checked += 1
    assert checked == len(got) > 10


def test_scd2_matches_effective_interval_replay():
    """q_scd2: type-2 dimension rows from signup events — each row
    effective until the user's next signup, open-ended current row."""
    got = _oracle("q_scd2").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, user_id, value, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet') WHERE event_type = 'signup'"
    ).df()
    checked = 0
    for _, g in ev.groupby("user_id"):
        rows = sorted(g.itertuples(), key=lambda r: (r.us, r.event_id))
        for i, r in enumerate(rows):
            nxt = rows[i + 1].us if i + 1 < len(rows) else None
            assert int(got.loc[r.event_id, "eff_from"]) == r.us
            if nxt is None:
                assert pd.isna(got.loc[r.event_id, "eff_to"])
                assert bool(got.loc[r.event_id, "is_current"])
            else:
                assert int(got.loc[r.event_id, "eff_to"]) == nxt
                assert not bool(got.loc[r.event_id, "is_current"])
            checked += 1
    assert checked == len(got) > 10


def test_rollup_time_matches_grouping_sets_replay():
    """q_rollup_time: the four grouping-sets levels re-derived from
    one (type, month, day) base aggregate."""
    got = _oracle("q_rollup_time")
    ev = duckdb.connect().execute(
        f"SELECT event_type, strftime(date_trunc('month', ts), '%Y-%m-%d') AS month, "
        f"strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    from collections import defaultdict

    base = defaultdict(lambda: [0.0, 0])
    for r in ev.itertuples():
        e = base[(r.event_type, r.month, r.day)]
        e[0] += r.value
        e[1] += 1
    expect = {}
    for (t, m, d), (v, n) in base.items():
        for key in ((t, m, d), (t, m, None), (t, None, None), (None, None, None)):
            e = expect.setdefault(key, [0.0, 0])
            e[0] += v
            e[1] += n
    assert len(got) == len(expect)
    for r in got.itertuples():
        key = (
            r.event_type if pd.notna(r.event_type) else None,
            r.month if pd.notna(r.month) else None,
            r.day if pd.notna(r.day) else None,
        )
        v, n = expect[key]
        assert int(r.n_ticks) == n, key
        assert abs(r.volume - v) < 1e-2 + 1e-9, key


def test_dedup_exact_matches_min_docid_reps():
    """q_dedup_exact: one representative (min doc_id) per distinct
    text."""
    got = _oracle("q_dedup_exact")
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, source, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    reps: dict = {}
    for r in docs.itertuples():
        if r.text not in reps or r.doc_id < reps[r.text][0]:
            reps[r.text] = (r.doc_id, r.lang, r.source)
    assert set(map(tuple, got[["doc_id", "lang", "source"]].values.tolist())) == set(reps.values())


def test_sim_topk_matches_bruteforce_cosine():
    """q_sim_topk: exact top-10 by cosine against query vector 0
    (rounded-6 ordering, vec_id tiebreak)."""
    got = _oracle("q_sim_topk")
    emb = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    vecs = {int(r.vec_id): np.asarray(list(r.embedding), dtype=float) for r in emb.itertuples()}
    q = vecs[0]
    nq = math.sqrt(float((q * q).sum()))
    cos = sorted(
        (
            (-_half_away(float((x * q).sum()) / (math.sqrt(float((x * x).sum())) * nq), 6), v)
            for v, x in vecs.items()
            if v != 0
        )
    )[:10]
    expect = [(v, -c) for c, v in cos]
    got_rows = [(int(r.vec_id), r.cosine) for r in got.itertuples()]
    assert [v for v, _ in expect] == [v for v, _ in got_rows]
    for (_, c), (_, gc) in zip(expect, got_rows):
        assert abs(c - gc) < 2e-6


def test_dedup_embedding_matches_label_blocked_cosine():
    """q_dedup_embedding: within-label pairs with cosine > 0.35 —
    the higher vec_id of each such pair is dropped."""
    got = set(_oracle("q_dedup_embedding")["dropped_id"].tolist())
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    from collections import defaultdict

    by_label = defaultdict(list)
    for r in emb.itertuples():
        by_label[r.label].append((int(r.vec_id), np.asarray(list(r.embedding), dtype=float)))
    dropped = set()
    for items in by_label.values():
        items.sort()
        for i, (va, xa) in enumerate(items):
            na = math.sqrt(float((xa * xa).sum()))
            for vb, xb in items[i + 1:]:
                c = float((xa * xb).sum()) / (na * math.sqrt(float((xb * xb).sum())))
                if c > 0.35:
                    dropped.add(vb)
    assert got == dropped
    assert 0 < len(dropped) < len(emb)


def test_dedup_simhash_matches_bitvote_replay():
    """q_dedup_simhash: 48-bit SimHash — md5-derived token hashes
    vote +1/-1 per bit WITH multiplicity; bit set when the vote sum
    is >= 0."""
    got = _oracle("q_dedup_simhash").set_index("doc_id")
    docs = _docs()
    checked = 0
    for r in docs.itertuples():
        votes = [0] * 48
        for tok in r.text.split(" "):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)
            for b in range(48):
                votes[b] += 1 if (h >> b) & 1 else -1
        sh = sum(1 << b for b in range(48) if votes[b] >= 0)
        assert int(got.loc[r.doc_id, "simhash"]) == sh, r.doc_id
        checked += 1
    assert checked == len(got) == len(docs)


def test_merge_upsert_matches_full_outer_classification():
    """q_merge_upsert: insert/update/keep classification of the
    synthetic update feed against the orders base."""
    got = _oracle("q_merge_upsert").set_index("o_orderkey")
    od = duckdb.connect().execute(
        f"SELECT o_orderkey, o_orderstatus, floor(o_totalprice * 100) / 100 AS price, "
        f"floor(o_totalprice * 1.05 * 100) / 100 AS price_up "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    upd = {}
    for r in od.itertuples():
        if r.o_orderkey % 10 == 0:
            upd[r.o_orderkey] = ("U", r.price_up)
        if r.o_orderkey % 97 == 0:
            upd[r.o_orderkey + 10_000_000] = ("N", r.price)
    checked = 0
    for r in od.itertuples():
        k = r.o_orderkey
        if k in upd:
            assert got.loc[k, "action"] == "update"
            assert got.loc[k, "status"] == upd[k][0]
            assert abs(got.loc[k, "price"] - upd[k][1]) < 1e-9
        else:
            assert got.loc[k, "action"] == "keep"
            assert got.loc[k, "status"] == r.o_orderstatus
            assert abs(got.loc[k, "price"] - r.price) < 1e-9
        checked += 1
    inserts = {k for k in upd if k >= 10_000_000}
    for k in inserts:
        assert got.loc[k, "action"] == "insert"
        checked += 1
    assert checked == len(got) == len(od) + len(inserts)


def test_win_ntile_matches_quartile_definition():
    """q_win_ntile: ntile(4) — the first (n mod 4) quartiles get
    ceil(n/4) rows, the rest floor(n/4), over (acctbal, custkey)
    order."""
    got = _oracle("q_win_ntile").set_index("c_custkey")
    cust = duckdb.connect().execute(
        f"SELECT c_custkey, c_acctbal FROM read_parquet('{SF}/customer.parquet')"
    ).df().sort_values(["c_acctbal", "c_custkey"]).reset_index(drop=True)
    n = len(cust)
    base, rem = divmod(n, 4)
    checked = 0
    i = 0
    for q in range(1, 5):
        size = base + (1 if q <= rem else 0)
        for _ in range(size):
            assert int(got.loc[cust.loc[i, "c_custkey"], "quartile"]) == q
            i += 1
            checked += 1
    assert checked == n == len(got)


def test_join_point_in_time_matches_version_lookup():
    """q_join_point_in_time: each purchase joined to the signup
    version effective at its timestamp ([eff_from, eff_to) interval,
    open-ended current)."""
    got = _oracle("q_join_point_in_time").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, user_id, event_type, value, epoch_us(ts) AS us "
        f"FROM read_parquet('{SF}/events.parquet')"
    ).df()
    versions: dict = {}
    for u, g in ev[ev.event_type == "signup"].groupby("user_id"):
        rows = sorted(g.itertuples(), key=lambda r: (r.us, r.event_id))
        versions[u] = [
            (r.us, rows[i + 1].us if i + 1 < len(rows) else None, r.event_id, r.value)
            for i, r in enumerate(rows)
        ]
    checked = 0
    for r in ev[ev.event_type == "purchase"].itertuples():
        hits = [
            (vid, val)
            for f, t, vid, val in versions.get(r.user_id, [])
            if r.us >= f and (t is None or r.us < t)
        ]
        if not hits:
            assert r.event_id not in got.index
            continue
        assert len(hits) == 1
        assert int(got.loc[r.event_id, "version_id"]) == hits[0][0]
        assert got.loc[r.event_id, "attr_value"] == hits[0][1]
        checked += 1
    assert checked == len(got) > 10


def test_shuffle_shard_matches_md5_positions():
    """q_shuffle_shard: 256-way md5 sharding with deterministic
    in-shard positions by (full hash, doc_id)."""
    got = _oracle("q_shuffle_shard")
    docs = _docs()
    from collections import defaultdict

    shards = defaultdict(list)
    for r in docs.itertuples():
        hx = hashlib.md5(f"shuffle:{r.doc_id}".encode()).hexdigest()
        shards[int(hx[:2], 16)].append((hx, r.doc_id))
    expect = set()
    for s, items in shards.items():
        for pos, (_, d) in enumerate(sorted(items), 1):
            expect.add((d, s, pos))
    assert set(map(tuple, got[["doc_id", "shard", "pos"]].values.tolist())) == expect


def test_embed_quantize_matches_int8_rule():
    """q_embed_quantize: symmetric int8 quantization — clamp to
    [-1, 1], scale by 127, floor(x+0.5)."""
    got = _oracle("q_embed_quantize").set_index("vec_id")
    emb = duckdb.connect().execute(
        f"SELECT vec_id, label, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    checked = 0
    for r in emb.itertuples():
        q = ",".join(
            str(math.floor(max(min(float(x), 1.0), -1.0) * 127 + 0.5))
            for x in r.embedding
        )
        assert got.loc[int(r.vec_id), "q"] == q
        assert got.loc[int(r.vec_id), "label"] == r.label
        checked += 1
    assert checked == len(got) == len(emb)


def test_quality_rules_matches_rule_counts():
    """q_quality_rules: per-rule violation counts, duplicate line
    keys, orphan lines and the clean rate."""
    got = _oracle("q_quality_rules")
    li = duckdb.connect().execute(
        f"SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
        f"epoch_us(l_shipdate) AS ship_us FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    ok = duckdb.connect().execute(
        f"SELECT DISTINCT o_orderkey FROM read_parquet('{SF}/orders.parquet')"
    ).df()["o_orderkey"]
    import datetime

    lo = datetime.datetime(1995, 1, 1).timestamp() * 1e6
    hi = datetime.datetime(2002, 1, 1).timestamp() * 1e6
    bq = int((li["l_quantity"] <= 0).sum())
    bp = int((li["l_extendedprice"] < 0).sum())
    bd = int(((li["l_discount"] < 0) | (li["l_discount"] > 0.5)).sum())
    bs = int(((li["ship_us"] < lo) | (li["ship_us"] >= hi)).sum())
    dup = len(li) - len(li[["l_orderkey", "l_linenumber"]].drop_duplicates())
    orphan = int((~li["l_orderkey"].isin(set(ok))).sum())
    r = got.iloc[0]
    assert (int(r.n_rows), int(r.bad_quantity), int(r.bad_price),
            int(r.bad_discount), int(r.bad_shipdate), int(r.dup_line_keys),
            int(r.orphan_lines)) == (len(li), bq, bp, bd, bs, dup, orphan)
    assert abs(r.clean_rate - (len(li) - (bq + bp + bd + bs)) / len(li)) < 1e-5


def test_profile_table_matches_column_stats():
    """q_profile_table: rows/nulls/distinct per profiled orders
    column."""
    got = _oracle("q_profile_table").set_index("column_name")
    od = duckdb.connect().execute(
        f"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, "
        f"o_orderpriority FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    for col in od.columns:
        assert int(got.loc[col, "n_rows"]) == len(od)
        assert int(got.loc[col, "n_nulls"]) == int(od[col].isna().sum())
        assert int(got.loc[col, "n_distinct"]) == od[col].dropna().nunique()
    assert len(got) == len(od.columns)


def test_tpch_q1_matches_quantized_aggregate_replay():
    """q_tpch_q1: the pricing-summary aggregates replayed row-by-row
    with the same floor-cents quantization (exact integer sums, so
    the replay is bit-comparable before the display rounding)."""
    got = _oracle("q_tpch_q1").set_index(["l_returnflag", "l_linestatus"])
    li = duckdb.connect().execute(
        f"SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice, "
        f"l_discount, l_tax, epoch_us(l_shipdate) AS ship_us "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    import datetime

    cutoff = datetime.datetime(1998, 9, 2, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    li = li[li["ship_us"] <= cutoff]
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in li.itertuples():
        e = agg[(r.l_returnflag, r.l_linestatus)]
        e[0] += int(r.l_quantity)
        e[1] += math.floor(r.l_extendedprice * 100)
        e[2] += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
        e[3] += math.floor(r.l_extendedprice * (1 - r.l_discount) * (1 + r.l_tax) * 100)
        e[4] += math.floor(r.l_discount * 10000)
        e[5] += 1
    assert len(agg) == len(got)
    for k, (q, bp, dp, ch, dc, n) in agg.items():
        g = got.loc[k]
        assert int(g.sum_qty) == q and int(g.count_order) == n
        assert abs(g.sum_base_price - bp / 100.0) < 1e-6
        assert abs(g.sum_disc_price - dp / 100.0) < 1e-6
        assert abs(g.sum_charge - ch / 100.0) < 1e-6
        assert abs(g.avg_qty - q / n) < 1e-3
        assert abs(g.avg_price - bp / 100.0 / n) < 1e-3
        assert abs(g.avg_disc - dc / 10000.0 / n) < 1e-5


def test_tpch_q6_matches_filtered_sum_replay():
    """q_tpch_q6: the forecast-revenue filter chain and floor-cents
    revenue sum."""
    got = _oracle("q_tpch_q6")
    li = duckdb.connect().execute(
        f"SELECT l_extendedprice, l_discount, l_quantity, epoch_us(l_shipdate) AS ship_us "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    import datetime

    lo = datetime.datetime(1996, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1997, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    sel = li[
        (li.ship_us >= lo) & (li.ship_us < hi)
        & (li.l_discount >= 0.05) & (li.l_discount <= 0.07)
        & (li.l_quantity < 24)
    ]
    rev = sum(math.floor(r.l_extendedprice * r.l_discount * 100) for r in sel.itertuples())
    assert int(got["n_items"].iloc[0]) == len(sel)
    assert abs(got["revenue"].iloc[0] - rev / 100.0) < 1e-6
    assert len(sel) > 0


def test_join_range_banded_matches_bisect_replay():
    """q_join_range_banded: per event, the count of events in the
    global (ts-5min, ts) band — replayed with a sorted-array bisect
    instead of the banded join."""
    got = _oracle("q_join_range_banded").set_index("event_id")
    ev = duckdb.connect().execute(
        f"SELECT event_id, epoch_us(ts) AS us FROM read_parquet('{SF}/events.parquet')"
    ).df()
    import bisect

    allts = sorted(ev["us"].tolist())
    BAND = 300_000_000
    checked = 0
    for r in ev.itertuples():
        n = bisect.bisect_left(allts, r.us) - bisect.bisect_left(allts, r.us - BAND)
        assert int(got.loc[r.event_id, "n_prior_5min"]) == n
        checked += 1
    assert checked == len(got) == len(ev)


def test_dataset_card_matches_corpus_summary():
    """q_dataset_card: corpus-level doc/lang/source/token/char counts,
    exact-dup and empty counts, avg tokens per doc."""
    got = _oracle("q_dataset_card").iloc[0]
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, source, text, n_chars FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    n_tokens = sum(len(re.findall(r"[a-z]+", t.lower())) for t in docs["text"])
    n_dups = len(docs) - docs["text"].map(lambda t: hashlib.md5(t.encode()).hexdigest()).nunique()
    n_empty = int((docs["text"].str.strip().str.len() == 0).sum())
    assert int(got.n_docs) == len(docs)
    assert int(got.n_langs) == docs["lang"].nunique()
    assert int(got.n_sources) == docs["source"].nunique()
    assert int(got.n_tokens) == n_tokens
    assert int(got.n_chars) == int(docs["n_chars"].sum())
    assert int(got.n_exact_dups) == n_dups
    assert int(got.n_empty) == n_empty
    assert abs(got.avg_tokens_per_doc - n_tokens / len(docs)) < 1e-2


def _li_parts():
    return duckdb.connect().execute(
        f"SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice, l_discount, "
        f"epoch_us(l_shipdate) AS ship_us FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()


def test_tpch_q14_matches_promo_share_replay():
    """q_tpch_q14: promo revenue share for 1996-09 — floor-cents
    per-line revenue, CASE-summed by part type."""
    got = _oracle("q_tpch_q14").iloc[0]
    li = _li_parts()
    pt = duckdb.connect().execute(
        f"SELECT p_partkey, p_type FROM read_parquet('{SF}/part.parquet')"
    ).df().set_index("p_partkey")["p_type"]
    import datetime

    lo = datetime.datetime(1996, 9, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1996, 10, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    sel = li[(li.ship_us >= lo) & (li.ship_us < hi)]
    promo = total = 0
    for r in sel.itertuples():
        cents = math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
        total += cents
        if pt[r.l_partkey] == "PROMO":
            promo += cents
    assert abs(got.promo_revenue - promo / 100.0) < 1e-6
    assert abs(got.total_revenue - total / 100.0) < 1e-6
    assert abs(got.promo_pct - 100.0 * promo / total) < 1e-3
    assert total > 0


def test_tpch_q19_matches_brand_band_predicate():
    """q_tpch_q19: the three-brand disjunctive (size-band x
    quantity-band) predicate and floor-cents revenue."""
    got = _oracle("q_tpch_q19").iloc[0]
    li = _li_parts()
    parts = duckdb.connect().execute(
        f"SELECT p_partkey, p_brand, p_size FROM read_parquet('{SF}/part.parquet')"
    ).df().set_index("p_partkey")
    bands = [("Brand#12", 1, 15, 1, 11), ("Brand#23", 1, 25, 10, 20),
             ("Brand#3", 1, 35, 20, 30)]
    rev = n = 0
    for r in li.itertuples():
        p = parts.loc[r.l_partkey]
        if any(
            p.p_brand == b and s_lo <= p.p_size <= s_hi and q_lo <= r.l_quantity <= q_hi
            for b, s_lo, s_hi, q_lo, q_hi in bands
        ):
            rev += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
            n += 1
    assert int(got.n_items) == n
    assert abs(got.revenue - rev / 100.0) < 1e-6


def test_tpch_q4_matches_exists_replay():
    """q_tpch_q4: Q3-1996 orders with at least one line shipped after
    the order date, counted by priority."""
    got = _oracle("q_tpch_q4").set_index("o_orderpriority")
    od = duckdb.connect().execute(
        f"SELECT o_orderkey, o_orderpriority, epoch_us(o_orderdate) AS od_us "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    li = _li_parts()
    import datetime
    from collections import Counter, defaultdict

    lo = datetime.datetime(1996, 7, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1996, 10, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    max_ship = defaultdict(int)
    for r in li.itertuples():
        max_ship[r.l_orderkey] = max(max_ship[r.l_orderkey], r.ship_us)
    counts: Counter = Counter()
    for r in od.itertuples():
        if lo <= r.od_us < hi and max_ship.get(r.o_orderkey, -1) > r.od_us:
            counts[r.o_orderpriority] += 1
    assert {k: int(got.loc[k, "order_count"]) for k in got.index} == dict(counts)
    assert sum(counts.values()) > 0


def test_tpch_q17_matches_small_quantity_replay():
    """q_tpch_q17: Brand#13 lines below 20% of the part's average
    quantity; yearly average as floor-cents sum / 7."""
    got = _oracle("q_tpch_q17").iloc[0]
    li = _li_parts()
    parts = duckdb.connect().execute(
        f"SELECT p_partkey, p_brand FROM read_parquet('{SF}/part.parquet')"
    ).df().set_index("p_partkey")["p_brand"]
    avg_qty = li.groupby("l_partkey")["l_quantity"].mean()
    cents = n = 0
    for r in li.itertuples():
        if parts[r.l_partkey] == "Brand#13" and r.l_quantity < 0.2 * avg_qty[r.l_partkey]:
            cents += math.floor(r.l_extendedprice * 100)
            n += 1
    assert int(got.n_items) == n
    assert abs(got.avg_yearly - cents / 700.0) < 1e-6


def test_tpch_q3_matches_shipping_priority_replay():
    """q_tpch_q3: BUILDING-segment unshipped-revenue top 10 — merges
    replayed in pandas, floor-cents per line."""
    got = _oracle("q_tpch_q3")
    import datetime

    cut = datetime.datetime(1997, 3, 15, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    cust = duckdb.connect().execute(
        f"SELECT c_custkey FROM read_parquet('{SF}/customer.parquet') "
        f"WHERE c_mktsegment = 'BUILDING'"
    ).df()["c_custkey"]
    od = duckdb.connect().execute(
        f"SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS od_us, "
        f"strftime(o_orderdate, '%Y-%m-%d') AS od_str "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    od = od[(od.od_us < cut) & od.o_custkey.isin(set(cust))]
    li = _li_parts()
    li = li[(li.ship_us > cut) & li.l_orderkey.isin(set(od.o_orderkey))]
    from collections import defaultdict

    rev = defaultdict(int)
    for r in li.itertuples():
        rev[r.l_orderkey] += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
    dates = od.set_index("o_orderkey")["od_str"]
    scored = sorted(((c / 100.0, k) for k, c in rev.items()), key=lambda x: (-x[0], x[1]))[:10]
    expect = [(k, v, dates[k]) for v, k in scored]
    got_rows = list(map(tuple, got[["l_orderkey", "revenue", "orderdate"]].values.tolist()))
    assert expect == got_rows and len(expect) > 0


def test_tpch_q10_matches_returned_item_replay():
    """q_tpch_q10: Q4-1996 returned-item revenue per customer,
    top 20."""
    got = _oracle("q_tpch_q10")
    import datetime

    lo = datetime.datetime(1996, 10, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1997, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    con = duckdb.connect()
    cust = con.execute(
        f"SELECT c_custkey, c_name, c_acctbal, c_nationkey FROM read_parquet('{SF}/customer.parquet')"
    ).df().set_index("c_custkey")
    nat = con.execute(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF}/nation.parquet')"
    ).df().set_index("n_nationkey")["n_name"]
    od = con.execute(
        f"SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS od_us "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    od = od[(od.od_us >= lo) & (od.od_us < hi)]
    okey_cust = od.set_index("o_orderkey")["o_custkey"]
    li = duckdb.connect().execute(
        f"SELECT l_orderkey, l_extendedprice, l_discount, l_returnflag "
        f"FROM read_parquet('{SF}/lineitem.parquet') WHERE l_returnflag = 'R'"
    ).df()
    from collections import defaultdict

    rev = defaultdict(int)
    for r in li.itertuples():
        ck = okey_cust.get(r.l_orderkey)
        if ck is not None and not pd.isna(ck):
            rev[int(ck)] += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
    scored = sorted(((c / 100.0, k) for k, c in rev.items()), key=lambda x: (-x[0], x[1]))[:20]
    expect = [
        (k, cust.loc[k, "c_name"], v, round(cust.loc[k, "c_acctbal"], 2),
         nat[cust.loc[k, "c_nationkey"]])
        for v, k in scored
    ]
    got_rows = list(map(tuple, got[["c_custkey", "c_name", "revenue", "acctbal", "n_name"]].values.tolist()))
    assert len(expect) == len(got_rows)
    for e, g in zip(expect, got_rows):
        assert e[:3] == g[:3] and e[4] == g[4]
        assert abs(e[3] - g[3]) < 1e-9


def test_tpch_q15_matches_top_supplier_replay():
    """q_tpch_q15: Q1-1996 max-revenue supplier(s) — exact cents
    argmax, all ties returned."""
    got = _oracle("q_tpch_q15")
    import datetime

    lo = datetime.datetime(1996, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1996, 4, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_suppkey, l_extendedprice, l_discount, epoch_us(l_shipdate) AS ship_us "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    li = li[(li.ship_us >= lo) & (li.ship_us < hi)]
    from collections import defaultdict

    rev = defaultdict(int)
    for r in li.itertuples():
        rev[r.l_suppkey] += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
    mx = max(rev.values())
    sup = con.execute(
        f"SELECT s_suppkey, s_name FROM read_parquet('{SF}/supplier.parquet')"
    ).df().set_index("s_suppkey")["s_name"]
    expect = {(k, sup[k], c / 100.0) for k, c in rev.items() if c == mx}
    assert set(map(tuple, got[["s_suppkey", "s_name", "total_revenue"]].values.tolist())) == expect


def test_tpch_q22_matches_global_sales_opportunity_replay():
    """q_tpch_q22: above-average positive balances in the candidate
    country codes, restricted to customers with no recent orders."""
    got = _oracle("q_tpch_q22").set_index("cntrycode")
    con = duckdb.connect()
    cust = con.execute(
        f"SELECT c_custkey, c_acctbal, c_nationkey % 10 AS code "
        f"FROM read_parquet('{SF}/customer.parquet')"
    ).df()
    import datetime

    cut = datetime.datetime(2000, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    recent = set(
        con.execute(
            f"SELECT DISTINCT o_custkey FROM read_parquet('{SF}/orders.parquet') "
            f"WHERE epoch_us(o_orderdate) >= {cut}"
        ).df()["o_custkey"]
    )
    codes = {1, 3, 5, 7}
    pool = cust[cust.code.isin(codes)]
    cutoff = pool[pool.c_acctbal > 0]["c_acctbal"].mean()
    cand = pool[(pool.c_acctbal > cutoff) & ~pool.c_custkey.isin(recent)]
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in cand.itertuples():
        agg[int(r.code)][0] += 1
        agg[int(r.code)][1] += math.floor(r.c_acctbal * 100)
    assert len(got) == len(agg)
    for code, (n, cents) in agg.items():
        assert int(got.loc[code, "numcust"]) == n
        assert abs(got.loc[code, "totacctbal"] - cents / 100.0) < 1e-9


def test_tpch_q18_matches_large_volume_replay():
    """q_tpch_q18: orders with total quantity > 250, joined to
    customer, top 100 by (totalprice desc, orderkey)."""
    got = _oracle("q_tpch_q18")
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_orderkey, l_quantity FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    qty = li.groupby("l_orderkey")["l_quantity"].sum()
    big = qty[qty > 250]
    od = con.execute(
        f"SELECT o_orderkey, o_custkey, o_totalprice, "
        f"strftime(o_orderdate, '%Y-%m-%d') AS od_str "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).df().set_index("o_orderkey")
    cust = con.execute(
        f"SELECT c_custkey, c_name FROM read_parquet('{SF}/customer.parquet')"
    ).df().set_index("c_custkey")["c_name"]
    rows = []
    for ok, q in big.items():
        o = od.loc[ok]
        rows.append((int(o.o_custkey), cust[int(o.o_custkey)], int(ok), o.od_str,
                     round(o.o_totalprice, 2), round(q, 2)))
    rows.sort(key=lambda r: (-r[4], r[2]))
    expect = rows[:100]
    got_rows = list(map(tuple, got[["c_custkey", "c_name", "o_orderkey",
                                    "orderdate", "totalprice", "total_qty"]].values.tolist()))
    assert len(expect) == len(got_rows)
    for e, g in zip(expect, got_rows):
        assert e[:4] == g[:4]
        assert abs(e[4] - g[4]) < 1e-9 and abs(e[5] - g[5]) < 1e-9


def test_tpch_q16_matches_supplier_count_replay():
    """q_tpch_q16: distinct qualifying suppliers per (brand, type,
    size) with the negative-balance supplier exclusion."""
    got = _oracle("q_tpch_q16")
    con = duckdb.connect()
    ps = con.execute(
        f"SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    part = con.execute(
        f"SELECT p_partkey, p_brand, p_type, p_size FROM read_parquet('{SF}/part.parquet')"
    ).df().set_index("p_partkey")
    bad = set(
        con.execute(
            f"SELECT s_suppkey FROM read_parquet('{SF}/supplier.parquet') WHERE s_acctbal < 0.0"
        ).df()["s_suppkey"]
    )
    sizes = {1, 5, 10, 15, 20, 25, 30, 35}
    from collections import defaultdict

    groups = defaultdict(set)
    for r in ps.itertuples():
        p = part.loc[r.pk]
        if (p.p_brand != "Brand#1" and p.p_type != "PROMO"
                and int(p.p_size) in sizes and r.sk not in bad):
            groups[(p.p_brand, p.p_type, int(p.p_size))].add(r.sk)
    expect = sorted(
        ((b, t, s, len(v)) for (b, t, s), v in groups.items()),
        key=lambda r: (-r[3], r[0], r[1], r[2]),
    )
    got_rows = list(map(tuple, got[["p_brand", "p_type", "p_size", "supplier_cnt"]].values.tolist()))
    assert expect == got_rows and len(expect) > 0


def test_tpch_q13_matches_order_count_histogram():
    """q_tpch_q13: customers-per-order-count histogram with the
    priority-filtered LEFT join (zero-order customers included)."""
    got = _oracle("q_tpch_q13")
    con = duckdb.connect()
    cust = con.execute(
        f"SELECT c_custkey FROM read_parquet('{SF}/customer.parquet')"
    ).df()["c_custkey"]
    od = con.execute(
        f"SELECT o_custkey FROM read_parquet('{SF}/orders.parquet') "
        f"WHERE o_orderpriority <> '4-NOT SPECIFIED'"
    ).df()["o_custkey"]
    per_cust = od.value_counts()
    from collections import Counter

    hist: Counter = Counter()
    for c in cust:
        hist[int(per_cust.get(c, 0))] += 1
    expect = sorted(hist.items(), key=lambda kv: (-kv[1], -kv[0]))
    got_rows = [(int(r.c_count), int(r.custdist)) for r in got.itertuples()]
    assert expect == got_rows


def _asia_nations(sf: str = SF) -> set:
    con = duckdb.connect()
    return set(
        con.execute(
            f"SELECT n_nationkey FROM read_parquet('{sf}/nation.parquet') n "
            f"JOIN read_parquet('{sf}/region.parquet') r ON n.n_regionkey = r.r_regionkey "
            f"WHERE r.r_name = 'ASIA'"
        ).df()["n_nationkey"]
    )


def test_tpch_q5_matches_local_supplier_replay():
    """q_tpch_q5: 1996 revenue per ASIA nation where the customer and
    the supplier share the nation."""
    got = _oracle("q_tpch_q5").set_index("n_name")
    con = duckdb.connect()
    asia = _asia_nations()
    nat = con.execute(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF}/nation.parquet')"
    ).df().set_index("n_nationkey")["n_name"]
    cust = con.execute(
        f"SELECT c_custkey, c_nationkey FROM read_parquet('{SF}/customer.parquet')"
    ).df().set_index("c_custkey")["c_nationkey"]
    sup = con.execute(
        f"SELECT s_suppkey, s_nationkey FROM read_parquet('{SF}/supplier.parquet')"
    ).df().set_index("s_suppkey")["s_nationkey"]
    import datetime

    lo = datetime.datetime(1996, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1997, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    od = con.execute(
        f"SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS od_us "
        f"FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    od = od[(od.od_us >= lo) & (od.od_us < hi)].set_index("o_orderkey")["o_custkey"]
    li = con.execute(
        f"SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    from collections import defaultdict

    rev = defaultdict(int)
    for r in li.itertuples():
        ck = od.get(r.l_orderkey)
        if ck is None or pd.isna(ck):
            continue
        cn, sn = int(cust[int(ck)]), int(sup[r.l_suppkey])
        if cn == sn and cn in asia:
            rev[nat[cn]] += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
    assert len(got) == len(rev) > 0
    for name, cents in rev.items():
        assert abs(got.loc[name, "revenue"] - cents / 100.0) < 1e-6


def test_tpch_q7_matches_volume_shipping_replay():
    """q_tpch_q7: NATION_1 <-> NATION_2 cross-trade revenue by ship
    year (sf0.01 — the pair has no trade at sf0.001, which would make
    the replay vacuous)."""
    got = _oracle("q_tpch_q7", SF01)
    con = duckdb.connect()
    nat = con.execute(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF01}/nation.parquet')"
    ).df().set_index("n_nationkey")["n_name"]
    cust = con.execute(
        f"SELECT c_custkey, c_nationkey FROM read_parquet('{SF01}/customer.parquet')"
    ).df().set_index("c_custkey")["c_nationkey"]
    sup = con.execute(
        f"SELECT s_suppkey, s_nationkey FROM read_parquet('{SF01}/supplier.parquet')"
    ).df().set_index("s_suppkey")["s_nationkey"]
    od = con.execute(
        f"SELECT o_orderkey, o_custkey FROM read_parquet('{SF01}/orders.parquet')"
    ).df().set_index("o_orderkey")["o_custkey"]
    li = con.execute(
        f"SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount, "
        f"year(l_shipdate) AS y, epoch_us(l_shipdate) AS ship_us "
        f"FROM read_parquet('{SF01}/lineitem.parquet')"
    ).df()
    import datetime

    lo = datetime.datetime(1996, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1998, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    li = li[(li.ship_us >= lo) & (li.ship_us < hi)]
    pair = {"NATION_1", "NATION_2"}
    from collections import defaultdict

    rev = defaultdict(int)
    for r in li.itertuples():
        sn = nat[int(sup[r.l_suppkey])]
        cn = nat[int(cust[int(od[r.l_orderkey])])]
        if {sn, cn} == pair:
            rev[(sn, cn, int(r.y))] += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
    assert len(rev) > 0, "q7 must be non-vacuous at sf0.01"
    gmap = {
        (r.supp_nation, r.cust_nation, int(r.l_year)): r.revenue for r in got.itertuples()
    }
    assert set(gmap) == set(rev)
    for k, cents in rev.items():
        assert abs(gmap[k] - cents / 100.0) < 1e-6


def test_tpch_q11_matches_important_stock_replay():
    """q_tpch_q11: ASIA part values above 2x the mean part value."""
    got = _oracle("q_tpch_q11")
    con = duckdb.connect()
    asia = _asia_nations()
    sup = con.execute(
        f"SELECT s_suppkey, s_nationkey FROM read_parquet('{SF}/supplier.parquet')"
    ).df().set_index("s_suppkey")["s_nationkey"]
    li = con.execute(
        f"SELECT l_partkey, l_suppkey, l_extendedprice, l_discount "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    from collections import defaultdict

    val = defaultdict(int)
    for r in li.itertuples():
        if int(sup[r.l_suppkey]) in asia:
            val[r.l_partkey] += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
    total, n = sum(val.values()), len(val)
    expect = sorted(
        ((k, c / 100.0) for k, c in val.items() if c > 2.0 * total / n),
        key=lambda kv: (-kv[1], kv[0]),
    )
    got_rows = [(int(r.p_partkey), r.value) for r in got.itertuples()]
    assert len(expect) == len(got_rows) > 0
    for (k, v), (gk, gv) in zip(expect, got_rows):
        assert k == gk and abs(v - gv) < 1e-6


def test_tpch_q2_matches_min_cost_supplier_replay():
    """q_tpch_q2: min-cost EUROPE supplier per qualifying part —
    per-(part, supplier) min unit cost in floor-cents, per-part
    argmin with ALL ties, top 100 by (acctbal desc, nation, name,
    part)."""
    got = _oracle("q_tpch_q2")
    con = duckdb.connect()
    li = con.execute(
        f"SELECT l_partkey, l_suppkey, l_extendedprice, l_quantity "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    cost: dict = {}
    for r in li.itertuples():
        c = math.floor(100 * r.l_extendedprice / r.l_quantity)
        k = (r.l_partkey, r.l_suppkey)
        if k not in cost or c < cost[k]:
            cost[k] = c
    eur_nk = set(
        con.execute(
            f"SELECT n_nationkey FROM read_parquet('{SF}/nation.parquet') n "
            f"JOIN read_parquet('{SF}/region.parquet') r ON n.n_regionkey = r.r_regionkey "
            f"WHERE r.r_name = 'EUROPE'"
        ).df()["n_nationkey"]
    )
    nat = con.execute(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF}/nation.parquet')"
    ).df().set_index("n_nationkey")["n_name"]
    sup = con.execute(
        f"SELECT s_suppkey, s_name, s_acctbal, s_nationkey FROM read_parquet('{SF}/supplier.parquet')"
    ).df().set_index("s_suppkey")
    parts_ok = set(
        con.execute(
            f"SELECT p_partkey FROM read_parquet('{SF}/part.parquet') "
            f"WHERE p_size <= 15 AND p_type = 'LARGE'"
        ).df()["p_partkey"]
    )
    from collections import defaultdict

    per_part = defaultdict(list)
    for (pk, sk), c in cost.items():
        if pk in parts_ok and int(sup.loc[sk, "s_nationkey"]) in eur_nk:
            per_part[pk].append((c, sk))
    rows = []
    for pk, cands in per_part.items():
        best = min(c for c, _ in cands)
        for c, sk in cands:
            if c == best:
                s = sup.loc[sk]
                rows.append((round(s.s_acctbal, 2), s.s_name,
                             nat[int(s.s_nationkey)], pk, c / 100.0))
    rows.sort(key=lambda r: (-r[0], r[2], r[1], r[3]))
    expect = rows[:100]
    got_rows = list(map(tuple, got[["acctbal", "s_name", "n_name", "p_partkey", "supplycost"]].values.tolist()))
    assert len(expect) == len(got_rows) > 0
    for e, g in zip(expect, got_rows):
        assert e[1:4] == g[1:4]
        assert abs(e[0] - g[0]) < 1e-9 and abs(e[4] - g[4]) < 1e-9


def test_tpch_q8_matches_market_share_replay():
    """q_tpch_q8: NATION_5's share of AMERICA PROMO revenue by order
    year."""
    got = _oracle("q_tpch_q8").set_index("o_year")
    con = duckdb.connect()
    amer = set(
        con.execute(
            f"SELECT n_nationkey FROM read_parquet('{SF}/nation.parquet') n "
            f"JOIN read_parquet('{SF}/region.parquet') r ON n.n_regionkey = r.r_regionkey "
            f"WHERE r.r_name = 'AMERICA'"
        ).df()["n_nationkey"]
    )
    nat = con.execute(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF}/nation.parquet')"
    ).df().set_index("n_nationkey")["n_name"]
    cust = con.execute(
        f"SELECT c_custkey, c_nationkey FROM read_parquet('{SF}/customer.parquet')"
    ).df().set_index("c_custkey")["c_nationkey"]
    sup = con.execute(
        f"SELECT s_suppkey, s_nationkey FROM read_parquet('{SF}/supplier.parquet')"
    ).df().set_index("s_suppkey")["s_nationkey"]
    promo = set(
        con.execute(
            f"SELECT p_partkey FROM read_parquet('{SF}/part.parquet') WHERE p_type = 'PROMO'"
        ).df()["p_partkey"]
    )
    import datetime

    lo = datetime.datetime(1996, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1998, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    od = con.execute(
        f"SELECT o_orderkey, o_custkey, epoch_us(o_orderdate) AS od_us, "
        f"year(o_orderdate) AS y FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    od = od[(od.od_us >= lo) & (od.od_us < hi)].set_index("o_orderkey")
    li = con.execute(
        f"SELECT l_orderkey, l_partkey, l_suppkey, l_extendedprice, l_discount "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    from collections import defaultdict

    tot = defaultdict(int)
    n5 = defaultdict(int)
    for r in li.itertuples():
        if r.l_partkey not in promo or r.l_orderkey not in od.index:
            continue
        o = od.loc[r.l_orderkey]
        if int(cust[int(o.o_custkey)]) not in amer:
            continue
        cents = math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
        y = int(o.y)
        tot[y] += cents
        if nat[int(sup[r.l_suppkey])] == "NATION_5":
            n5[y] += cents
    assert set(tot) == set(got.index) and len(tot) > 0
    for y, c in tot.items():
        assert abs(got.loc[y, "total_revenue"] - c / 100.0) < 1e-6
        assert abs(got.loc[y, "mkt_share"] - n5[y] / c) < 1e-3


def test_tpch_q9_matches_product_profit_replay():
    """q_tpch_q9: widget-part profit (revenue minus half retail cost)
    by supplier nation and order year, floor-cents per line."""
    got = _oracle("q_tpch_q9").set_index(["nation", "o_year"])
    con = duckdb.connect()
    parts = con.execute(
        f"SELECT p_partkey, p_retailprice FROM read_parquet('{SF}/part.parquet') "
        f"WHERE p_name LIKE '%widget%'"
    ).df().set_index("p_partkey")["p_retailprice"]
    nat = con.execute(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF}/nation.parquet')"
    ).df().set_index("n_nationkey")["n_name"]
    sup = con.execute(
        f"SELECT s_suppkey, s_nationkey FROM read_parquet('{SF}/supplier.parquet')"
    ).df().set_index("s_suppkey")["s_nationkey"]
    od = con.execute(
        f"SELECT o_orderkey, year(o_orderdate) AS y FROM read_parquet('{SF}/orders.parquet')"
    ).df().set_index("o_orderkey")["y"]
    li = con.execute(
        f"SELECT l_orderkey, l_partkey, l_suppkey, l_extendedprice, l_discount, l_quantity "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    from collections import defaultdict

    profit = defaultdict(int)
    for r in li.itertuples():
        rp = parts.get(r.l_partkey)
        if rp is None or pd.isna(rp):
            continue
        cents = math.floor(
            (r.l_extendedprice * (1 - r.l_discount) - 0.5 * rp * r.l_quantity) * 100
        )
        profit[(nat[int(sup[r.l_suppkey])], int(od[r.l_orderkey]))] += cents
    assert set(profit) == set(got.index) and len(profit) > 0
    for k, c in profit.items():
        assert abs(got.loc[k, "sum_profit"] - c / 100.0) < 1e-6


def test_tpch_q20_matches_potential_promotion_replay():
    """q_tpch_q20: AFRICA suppliers who shipped > 30 units of any
    'red '-prefixed part in 1996."""
    got = _oracle("q_tpch_q20")
    con = duckdb.connect()
    import datetime

    lo = datetime.datetime(1996, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1997, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    li = con.execute(
        f"SELECT l_suppkey, l_partkey, l_quantity, epoch_us(l_shipdate) AS ship_us "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    li = li[(li.ship_us >= lo) & (li.ship_us < hi)]
    red = set(
        con.execute(
            f"SELECT p_partkey FROM read_parquet('{SF}/part.parquet') "
            f"WHERE p_name LIKE 'red %'"
        ).df()["p_partkey"]
    )
    qty = li.groupby(["l_suppkey", "l_partkey"])["l_quantity"].sum()
    qualified = {
        sk for (sk, pk), q in qty.items() if pk in red and round(q, 2) > 30.0
    }
    afr = set(
        con.execute(
            f"SELECT n_nationkey FROM read_parquet('{SF}/nation.parquet') n "
            f"JOIN read_parquet('{SF}/region.parquet') r ON n.n_regionkey = r.r_regionkey "
            f"WHERE r.r_name = 'AFRICA'"
        ).df()["n_nationkey"]
    )
    sup = con.execute(
        f"SELECT s_suppkey, s_name, s_nationkey FROM read_parquet('{SF}/supplier.parquet')"
    ).df()
    nat = con.execute(
        f"SELECT n_nationkey, n_name FROM read_parquet('{SF}/nation.parquet')"
    ).df().set_index("n_nationkey")["n_name"]
    expect = sorted(
        (int(r.s_suppkey), r.s_name, nat[int(r.s_nationkey)])
        for r in sup.itertuples()
        if int(r.s_nationkey) in afr and int(r.s_suppkey) in qualified
    )
    got_rows = list(map(tuple, got[["s_suppkey", "s_name", "n_name"]].values.tolist()))
    assert expect == got_rows and len(expect) > 0


def test_tpch_q21_matches_waiting_supplier_replay():
    """q_tpch_q21: suppliers who were the SOLE late supplier on
    multi-supplier finished orders, counting their late lines."""
    got = _oracle("q_tpch_q21")
    con = duckdb.connect()
    od = con.execute(
        f"SELECT o_orderkey, epoch_us(o_orderdate) AS od_us "
        f"FROM read_parquet('{SF}/orders.parquet') WHERE o_orderstatus = 'F'"
    ).df().set_index("o_orderkey")["od_us"]
    li = con.execute(
        f"SELECT l_orderkey, l_suppkey, epoch_us(l_shipdate) AS ship_us "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    DAY45 = 45 * 24 * 3_600_000_000
    from collections import defaultdict

    n_late = defaultdict(int)
    supps = defaultdict(set)
    for r in li.itertuples():
        od_us = od.get(r.l_orderkey)
        if od_us is None or pd.isna(od_us):
            continue
        supps[r.l_orderkey].add(r.l_suppkey)
        key = (r.l_orderkey, r.l_suppkey)
        n_late.setdefault(key, 0)
        if r.ship_us > od_us + DAY45:
            n_late[key] += 1
    numwait = defaultdict(int)
    for ok, sks in supps.items():
        late_sups = [sk for sk in sks if n_late[(ok, sk)] > 0]
        if len(sks) >= 2 and len(late_sups) == 1:
            numwait[late_sups[0]] += n_late[(ok, late_sups[0])]
    sup = con.execute(
        f"SELECT s_suppkey, s_name FROM read_parquet('{SF}/supplier.parquet')"
    ).df().set_index("s_suppkey")["s_name"]
    by_name = defaultdict(int)
    for sk, n in numwait.items():
        by_name[sup[sk]] += n
    expect = sorted(by_name.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got_rows = [(r.s_name, int(r.numwait)) for r in got.itertuples()]
    assert expect == got_rows and len(expect) > 0


def test_filter_matches_predicate_replay():
    """q_filter: the composite part predicate replayed row-wise."""
    got = _oracle("q_filter")
    pt = duckdb.connect().execute(
        f"SELECT p_partkey, p_name, p_type, p_size, p_brand, p_retailprice "
        f"FROM read_parquet('{SF}/part.parquet')"
    ).df()
    expect = {
        (r.p_partkey, r.p_name, r.p_retailprice)
        for r in pt.itertuples()
        if ("PROMO" in r.p_type or r.p_size in (1, 5, 9))
        and 500 <= r.p_retailprice <= 1500 and r.p_brand is not None
    }
    assert set(map(tuple, got[["p_partkey", "p_name", "p_retailprice"]].values.tolist())) == expect
    assert 0 < len(expect) < len(pt)


def test_project_matches_expression_replay():
    """q_project: per-line revenue expression. (l_orderkey,
    l_linenumber) is NOT unique in the fixture — the quality-rules
    dup counter is deliberately nonzero — so rows align by full-tuple
    sort, not by key lookup."""
    got = sorted(map(tuple, _oracle("q_project").values.tolist()))
    li = _li()
    expect = sorted(
        (r.l_orderkey, r.l_linenumber, r.l_extendedprice * (1 - r.l_discount))
        for r in li.itertuples()
    )
    assert len(expect) == len(got)
    for e, g in zip(expect, got):
        assert e[:2] == g[:2]
        assert abs(e[2] - g[2]) < 1e-9


def test_limit_offset_matches_slice_replay():
    """q_limit_offset: rows 101-150 of the orderkey order."""
    got = _oracle("q_limit_offset")
    od = duckdb.connect().execute(
        f"SELECT o_orderkey, o_orderstatus FROM read_parquet('{SF}/orders.parquet') "
        f"ORDER BY o_orderkey"
    ).df()
    expect = list(map(tuple, od.iloc[100:150][["o_orderkey", "o_orderstatus"]].values.tolist()))
    assert list(map(tuple, got[["o_orderkey", "o_orderstatus"]].values.tolist())) == expect


def test_sort_multi_matches_three_key_order():
    """q_sort_multi: (priority desc, totalprice asc, orderkey asc)
    top 100."""
    got = _oracle("q_sort_multi")
    od = duckdb.connect().execute(
        f"SELECT o_orderkey, o_orderpriority, o_totalprice FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    rows = sorted(
        ((r.o_orderkey, r.o_orderpriority, r.o_totalprice) for r in od.itertuples()),
        key=lambda r: (tuple(-ord(c) for c in r[1]), r[2], r[0]),
    )[:100]
    got_rows = list(map(tuple, got[["o_orderkey", "o_orderpriority", "totalprice"]].values.tolist()))
    assert rows == got_rows


def test_agg_global_matches_scalar_replay():
    """q_agg_global: the seven whole-table scalars."""
    got = _oracle("q_agg_global").iloc[0]
    li = duckdb.connect().execute(
        f"SELECT l_quantity, l_extendedprice, "
        f"strftime(l_shipdate, '%Y-%m-%d') AS ship_str "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    assert int(got.n_rows) == len(li)
    assert abs(got.sum_qty - round(li.l_quantity.sum(), 2)) < 1e-6
    assert abs(got.avg_price - li.l_extendedprice.mean()) < 1e-2
    assert abs(got.min_price - li.l_extendedprice.min()) < 1e-9
    assert abs(got.max_price - li.l_extendedprice.max()) < 1e-9
    assert got.first_ship == li.ship_str.min()
    assert got.last_ship == li.ship_str.max()


def test_join_broadcast_matches_brand_rollup():
    """q_join_broadcast: floor-cents revenue per brand through the
    part dimension."""
    got = _oracle("q_join_broadcast").set_index("p_brand")
    li = _li_parts()
    brand = duckdb.connect().execute(
        f"SELECT p_partkey, p_brand FROM read_parquet('{SF}/part.parquet')"
    ).df().set_index("p_partkey")["p_brand"]
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for r in li.itertuples():
        e = agg[brand[r.l_partkey]]
        e[0] += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
        e[1] += 1
    assert len(agg) == len(got)
    for b, (c, n) in agg.items():
        assert int(got.loc[b, "n_rows"]) == n
        assert abs(got.loc[b, "revenue"] - c / 100.0) < 1e-6


def test_join_sortmerge_matches_priority_rollup():
    """q_join_sortmerge: quantity rollup per order priority through
    the orders fact-fact join."""
    got = _oracle("q_join_sortmerge").set_index("o_orderpriority")
    li = _li()
    pri = duckdb.connect().execute(
        f"SELECT o_orderkey, o_orderpriority FROM read_parquet('{SF}/orders.parquet')"
    ).df().set_index("o_orderkey")["o_orderpriority"]
    from collections import defaultdict

    agg = defaultdict(lambda: [0.0, 0])
    for r in li.itertuples():
        e = agg[pri[r.l_orderkey]]
        e[0] += r.l_quantity
        e[1] += 1
    assert len(agg) == len(got)
    for p, (q, n) in agg.items():
        assert int(got.loc[p, "n_rows"]) == n
        assert abs(got.loc[p, "sum_qty"] - round(q, 2)) < 1e-2


def test_join_cross_matches_cartesian_replay():
    """q_join_cross: region x distinct market segment cartesian."""
    got = _oracle("q_join_cross")
    con = duckdb.connect()
    regions = con.execute(
        f"SELECT r_name FROM read_parquet('{SF}/region.parquet')"
    ).df()["r_name"].tolist()
    segs = con.execute(
        f"SELECT DISTINCT c_mktsegment FROM read_parquet('{SF}/customer.parquet')"
    ).df()["c_mktsegment"].tolist()
    expect = {(r, s) for r in regions for s in segs}
    assert set(map(tuple, got[["r_name", "seg"]].values.tolist())) == expect
    assert len(got) == len(regions) * len(segs)


def test_join_skew_salted_matches_segment_rollup():
    """q_join_skew_salted: events joined to customer by user key,
    value rollup per market segment."""
    got = _oracle("q_join_skew_salted").set_index("c_mktsegment")
    ev = _events()
    seg = duckdb.connect().execute(
        f"SELECT c_custkey, c_mktsegment FROM read_parquet('{SF}/customer.parquet')"
    ).df().set_index("c_custkey")["c_mktsegment"]
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0.0])
    for r in ev.itertuples():
        s = seg.get(r.user_id)
        if s is not None and not pd.isna(s):
            agg[s][0] += 1
            agg[s][1] += r.value
    assert len(agg) == len(got)
    for s, (n, v) in agg.items():
        assert int(got.loc[s, "n_events"]) == n
        assert abs(got.loc[s, "total_value"] - v) < 1e-2 + 1e-9


def test_join_bloom_matches_filtered_join_replay():
    """q_join_bloom: urgent Q1-1996 orders' line revenue."""
    got = _oracle("q_join_bloom")
    import datetime

    lo = datetime.datetime(1996, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    hi = datetime.datetime(1996, 4, 1, tzinfo=datetime.timezone.utc).timestamp() * 1e6
    od = duckdb.connect().execute(
        f"SELECT o_orderkey, epoch_us(o_orderdate) AS od_us "
        f"FROM read_parquet('{SF}/orders.parquet') WHERE o_orderpriority = '1-URGENT'"
    ).df()
    keys = set(od[(od.od_us >= lo) & (od.od_us < hi)]["o_orderkey"])
    li = _li_parts()
    cents = n = 0
    for r in li.itertuples():
        if r.l_orderkey in keys:
            cents += math.floor(r.l_extendedprice * (1 - r.l_discount) * 100)
            n += 1
    assert len(got) == 1
    assert int(got["n_lines"].iloc[0]) == n
    assert abs(got["revenue"].iloc[0] - cents / 100.0) < 1e-6


def test_join_lateral_matches_top2_per_customer():
    """q_join_lateral: each customer's top-2 orders by (totalprice
    desc, orderkey asc) — customers with no orders emit nothing."""
    got = _oracle("q_join_lateral")
    od = duckdb.connect().execute(
        f"SELECT o_custkey, o_orderkey, o_totalprice FROM read_parquet('{SF}/orders.parquet')"
    ).df()
    expect = []
    for ck, g in od.groupby("o_custkey"):
        top = sorted(g.itertuples(), key=lambda r: (-r.o_totalprice, r.o_orderkey))[:2]
        for r in top:
            expect.append((ck, r.o_orderkey, r.o_totalprice))
    got_rows = set(map(tuple, got[["c_custkey", "o_orderkey", "o_totalprice"]].values.tolist()))
    assert got_rows == set(expect)


def test_fn_cond_null_matches_scalar_semantics():
    """q_fn_cond_null: coalesce/nullif/least/greatest/CASE null
    semantics replayed row-wise (full-tuple sort alignment — the line
    key is not unique in the fixture)."""
    got = _oracle("q_fn_cond_null")
    got_rows = sorted(
        (
            (r.l_orderkey, r.l_linenumber, r.flag_or_x, r.qty_cap, r.qty_floor,
             bool(r.was_n),
             (True, 0.0) if pd.isna(r.big_disc) else (False, round(r.big_disc, 9)))
            for r in got.itertuples()
        )
    )
    li = duckdb.connect().execute(
        f"SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount "
        f"FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    expect = sorted(
        (
            (r.l_orderkey, r.l_linenumber,
             r.l_returnflag if r.l_returnflag != "N" else "X",
             min(r.l_quantity, 25.0), max(r.l_quantity, 5.0),
             r.l_returnflag == "N",
             (False, round(r.l_discount, 9)) if r.l_discount > 0.05 else (True, 0.0))
            for r in li.itertuples()
        )
    )
    assert expect == got_rows


def test_lev_banded_helper_matches_full_dp():
    """The banded Levenshtein used by the dedup_edit replay is itself
    replay infrastructure — pin it against the plain O(n*m) DP on
    random short strings (hypothesis) so the replay can't be wrong in
    the same way twice."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    def lev_full(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    @settings(max_examples=300, deadline=None)
    @given(
        st.text(alphabet="abc", max_size=12),
        st.text(alphabet="abc", max_size=12),
        st.integers(min_value=0, max_value=6),
    )
    def check(a, b, k):
        d = lev_full(a, b)
        banded = _lev_banded(a, b, k)
        if d <= k:
            assert banded == d
        else:
            assert banded is None

    check()


def test_half_away_helper_matches_duckdb_round():
    """_half_away mirrors what the ENGINES do: round the DOUBLE
    half-away-from-zero. The reference is DuckDB's own round() on the
    same double — NOT decimal.Decimal of the exact value, which
    disagrees whenever a decimal tie like 1.275 is not representable
    (the double is 1.27499…, so both engines and the helper round it
    DOWN while exact-decimal HALF_UP would go up; probed exhaustively:
    23 k such inputs on the 5e-6 grid)."""
    import random

    rng = random.Random(1275)
    xs = [rng.randint(-2_000_000, 2_000_000) / 1_000_000 for _ in range(400)]
    xs += [1.275, -1.275, 0.5, -0.5, 2.675, 0.0000005, -0.0000005, 0.0]
    con = duckdb.connect()
    for nd in range(0, 7):
        scale = 10**nd
        # the ADVICE r10 family: products one ulp below/above a tie
        # (floor(v + 0.5) misrounds the below side), at THIS scale
        adv = []
        for base in (0.49999999999999994, 0.5, math.nextafter(0.5, 1)):
            adv += [base / scale, -base / scale]
        for k in (0, 1, 2, 7):
            t = (k + 0.5) / scale
            adv += [math.nextafter(t, 0), t, math.nextafter(t, 9)]
        probe = xs + adv
        want = con.execute(
            "SELECT list_transform(?, x -> round(x, ?))", [probe, nd]
        ).fetchone()[0]
        for x, w in zip(probe, want):
            got = _half_away(x, nd)
            assert got == w or abs(got - w) < 1e-12, (x, nd, got, w)


def test_round_half_away_helper_matches_duckdb_round():
    """The integer sibling (_round_half_away) pinned the same way:
    DuckDB's round(x, 0) is the reference, including the doubles one
    ulp below the .5 tie where the old floor(x + 0.5) form went UP
    while the engine goes DOWN (ADVICE r10), exact .5 ties
    (half-away, not python's half-even), and odd ties near 2^51."""
    import random

    rng = random.Random(4999)
    xs = [rng.randint(-4_000_000, 4_000_000) / 100 for _ in range(400)]
    xs += [
        0.49999999999999994, -0.49999999999999994, 0.5, -0.5, 1.5, 2.5,
        -2.5, 3.5, 0.0, math.nextafter(0.5, 1), math.nextafter(1.5, 0),
        4503599627370495.5, 2251799813685247.5, -2251799813685247.5,
    ]
    con = duckdb.connect()
    want = con.execute(
        "SELECT list_transform(?, x -> round(x, 0))", [xs]
    ).fetchone()[0]
    for x, w in zip(xs, want):
        assert _round_half_away(x) == w, (x, _round_half_away(x), w)


def test_gopher_rules_matches_python_replay():
    """q_text_gopher_rules: every metric and published-threshold flag
    (Rae et al. 2021 Table A1) re-derived in pure python from the raw
    documents fixture — the independent third derivation alongside the
    Spark/DuckDB texts."""
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    got = _oracle("q_text_gopher_rules").set_index("doc_id")
    docs = _docs()
    assert len(got) == len(docs)
    for r in docs.itertuples():
        toks = r.text.split(" ")
        n = len(toks)
        mean_len = sum(len(t) for t in toks) / n
        n_sym = r.text.count("#") + r.text.count("...")
        sym_ratio = n_sym / n
        alpha_ratio = sum(1 for t in toks if re.search("[A-Za-z]", t)) / n
        n_stop = len(set(toks) & stops)
        rules = [
            50 <= n <= 100000,
            3 <= mean_len <= 10,
            sym_ratio <= 0.1,
            alpha_ratio >= 0.8,
            n_stop >= 2,
        ]
        row = got.loc[r.doc_id]
        assert row["n_words"] == n
        assert abs(row["mean_word_len"] - mean_len) < 1e-12
        assert abs(row["symbol_ratio"] - sym_ratio) < 1e-12
        assert abs(row["alpha_word_ratio"] - alpha_ratio) < 1e-12
        assert row["n_stop_kinds"] == n_stop
        flags = [row["r_word_count"], row["r_mean_len"], row["r_symbol"],
                 row["r_alpha"], row["r_stopword"]]
        assert flags == [int(x) for x in rules]
        assert row["keep"] == int(all(rules))


def test_semdedup_matches_python_replay():
    """q_dedup_semdedup: the full trajectory — exact-integer Lloyd
    (2 iterations, content-hash seeds, struct-min ties, floor-mean
    updates) then within-cluster lower-id cos>=0.35 dedup — re-derived
    in pure python/ints from the raw embeddings fixture."""
    emb = duckdb.connect().execute(
        f"SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet')"
    ).df()
    pts = {
        int(r.vec_id): [int(math.floor(float(x) * 1000000)) for x in r.embedding]
        for r in emb.itertuples()
    }
    seeds = sorted(
        pts,
        key=lambda v: (int(hashlib.md5(f"km:{v}".encode()).hexdigest()[:15], 16), v),
    )[:16]
    cents = {i + 1: list(pts[v]) for i, v in enumerate(seeds)}

    def d2(q, c):
        return sum((a - b) * (a - b) for a, b in zip(q, c))

    for _ in range(2):
        assign = {v: min((d2(q, c), cid) for cid, c in cents.items())[1]
                  for v, q in pts.items()}
        new = {}
        for cid in cents:
            members = [pts[v] for v in assign if assign[v] == cid]
            if not members:
                new[cid] = cents[cid]
            else:
                ncnt = len(members)
                new[cid] = [
                    (sum(col) - ((sum(col) % ncnt) + ncnt) % ncnt) // ncnt
                    for col in zip(*members)
                ]
        cents = new
    final = {v: min((d2(q, c), cid) for cid, c in cents.items())[1]
             for v, q in pts.items()}
    tau = 350_000_000_000
    n_near = {}
    for v, q in pts.items():
        n_near[v] = sum(
            1
            for u, p in pts.items()
            if u < v and final[u] == final[v]
            and sum(a * b for a, b in zip(p, q)) >= tau
        )
    got = _oracle("q_dedup_semdedup").set_index("vec_id")
    assert len(got) == len(pts)
    for v in pts:
        row = got.loc[v]
        assert row["cluster_id"] == final[v], v
        assert row["n_near_lower"] == n_near[v], v
        assert row["kept"] == int(n_near[v] == 0), v


def test_dsir_matches_python_replay():
    """q_doc_dsir: hashed-bigram DSIR log importance weights (Xie et
    al. 2023) re-derived in pure python — md5 bucket hashing, Laplace
    smoothing, quantized-ln fold — from the raw documents fixture."""
    docs = duckdb.connect().execute(
        f"SELECT doc_id, lang, text FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    B = 1024

    def bucket(bg: str) -> int:
        return int(hashlib.md5(f"ds:{bg}".encode()).hexdigest()[:8], 16) % B

    per_doc: dict[int, list[int]] = {}
    lang_of: dict[int, str] = {}
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        bs = [bucket(f"{a} {b}") for a, b in zip(toks, toks[1:])]
        per_doc[int(r.doc_id)] = bs
        lang_of[int(r.doc_id)] = r.lang
        for b in bs:
            tgt = r.lang == "en"
            ct[b] = ct.get(b, 0) + (1 if tgt else 0)
            cr[b] = cr.get(b, 0) + (0 if tgt else 1)
    tt, tr = sum(ct.values()), sum(cr.values())

    def qln(num: int, den: int) -> int:
        return int(_round_half_away(math.log(num / den) * 1_000_000_000))

    got = _oracle("q_doc_dsir").set_index("doc_id")
    assert len(got) == len(per_doc)
    for did, bs in per_doc.items():
        qlw = sum(
            qln(ct.get(b, 0) + 1, tt + B) - qln(cr.get(b, 0) + 1, tr + B)
            for b in bs
        )
        row = got.loc[did]
        assert row["lang"] == lang_of[did]
        assert row["n_feats"] == len(bs)
        assert abs(row["dsir_logw"] - qlw / 1_000_000_000) < 1e-12, did
        assert row["keep"] == int(qlw > 0), did


def test_repetition_rules_match_python_replay():
    """q_text_repetition_rules: Gopher Table A1 repetition metrics
    (Rae et al. 2021) re-derived in pure python from the raw fixture —
    n-gram counting, (count, chars) top-gram argmax, duplicated-gram
    CHARACTER COVERAGE via an independent boolean char mask (not the
    engines' interval-sweep algebra) — so the shared explode/window
    SQL shape cannot hide an expression error in both engines at
    once."""
    docs = _docs(SF01)
    got = _oracle("q_text_repetition_rules", SF01).set_index("doc_id")
    assert len(got) == len(docs)
    tops = {2: 0.20, 3: 0.18, 4: 0.16}
    dups = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}
    for r in docs.itertuples():
        toks = r.text.split(" ")
        total = len(r.text)
        row = got.loc[int(r.doc_id)]
        assert row["n_words"] == len(toks)
        assert row["chars_total"] == total
        keep = True
        for n in sorted(list(tops) + list(dups)):
            cnt: dict[str, int] = {}
            for i in range(len(toks) - n + 1):
                g = " ".join(toks[i : i + n])
                cnt[g] = cnt.get(g, 0) + 1
            if n in tops:
                if cnt:
                    c, ch = max((c, len(g)) for g, c in cnt.items())
                    frac = (c * ch) / total
                else:
                    frac = 0.0
                col, thr = f"top{n}_frac", tops[n]
            else:
                covered = [False] * total
                starts = []
                p = 0
                for t in toks:
                    starts.append(p)
                    p += len(t) + 1
                for i in range(len(toks) - n + 1):
                    g = " ".join(toks[i : i + n])
                    if cnt[g] >= 2:
                        for j in range(starts[i], starts[i] + len(g)):
                            covered[j] = True
                frac = sum(covered) / total
                col, thr = f"dup{n}_frac", dups[n]
            # identical int64s through identical IEEE divisions: exact
            assert row[col] == frac, (r.doc_id, col)
            flag = frac <= thr
            assert row[f"r_{col[:-5]}"] == int(flag), (r.doc_id, col)
            keep = keep and flag
        assert row["keep"] == int(keep), r.doc_id


def test_banding_sweep_empty_pair_corpus_oracle():
    """The NULL arm of q_dedup_banding_sweep's recall guard, never
    exercised by the fixture (which has >= 0.95 pairs at every SF):
    on a corpus with NO near-dup pairs the oracle must emit all 8
    configs with n_pairs = 0 and NULL expected recall / candidates —
    the exact cross-engine hazard the CASE guard exists for (Spark's
    0/0 double is NaN, not NULL). The Spark twin lives in
    test_llm_ops.test_banding_sweep_empty_pair_corpus_spark."""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(0, 'alpha beta gamma'), (1, 'delta epsilon zeta'), "
        "(2, 'eta theta iota')) AS t(doc_id, text)"
    )
    df = con.execute(all_oracles()["q_dedup_banding_sweep"]).df()
    assert len(df) == 8
    assert (df["n_pairs"] == 0).all()
    assert df["exp_recall"].isna().all()
    assert df["exp_candidates"].isna().all()
    # analytic landmarks are corpus-independent constants
    assert df.set_index("rows_per_band").loc[1, "bands"] == 96


def test_pii_redact_adversarial_strings_oracle():
    """q_text_pii_redact's regex subset on adversarial strings, oracle
    side (RE2) vs python re — multiple matches per doc, PII at string
    start/end, near-misses (a 4-dot decimal run, a trailing dot after
    an email), and a version string that the documented-naive IPv4
    pattern SHOULD match. doc_ids are chosen off the synthesis moduli
    (7/11/13) so only the crafted strings carry PII. The Spark twin is
    test_llm_ops.test_pii_redact_adversarial_strings_spark."""
    texts = {
        1: "a@b.co leads and x@y.org trails z@w.io",
        2: "555-123-4567 starts it and version 1.2.3.4 matches by design",
        3: "pi 3.14 no ip but 999.999.999.999 matches the naive class",
        4: "write to user@example.com. with a trailing dot",
        5: "clean text with no pii at all",
    }
    con = duckdb.connect()
    rows = ", ".join(f"({k}, '{v}')" for k, v in texts.items())
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM (VALUES {rows}) AS t(doc_id, text)"
    )
    got = con.execute(all_oracles()["q_text_pii_redact"]).df().set_index("doc_id")
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b")
    ip = re.compile(r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")
    for did, t in texts.items():
        row = got.loc[did]
        assert row["n_emails"] == len(email.findall(t)), did
        assert row["n_phones"] == len(phone.findall(t)), did
        assert row["n_ips"] == len(ip.findall(t)), did
        red = ip.sub("|IP|", phone.sub("|PHONE|", email.sub("|EMAIL|", t)))
        assert row["redacted"] == red, did
    # the cases actually bite: 3 emails in doc 1; start-anchored phone;
    # both naive-IP matches; the trailing-dot email excludes the dot
    assert got.loc[1, "n_emails"] == 3
    assert got.loc[2, "n_phones"] == 1 and got.loc[2, "n_ips"] == 1
    assert got.loc[3, "n_ips"] == 1
    assert "|EMAIL|." in got.loc[4, "redacted"]
    assert got.loc[5, "has_pii"] == 0


def test_repetition_rules_dup_path_on_crafted_corpus():
    """The fixture corpus has no exact 5..10-gram repeats (dup fracs
    honestly 0 everywhere), so the duplicate-gram arm of the shared
    SQL would otherwise never be exercised. Run the registered ORACLE
    on a crafted corpus with a genuinely repetitive document and check
    the dup mass against hand arithmetic. (The Spark side of the same
    arm is covered by the crafted-parquet differential in
    test_llm_ops.test_repetition_rules_spark_dup_path.)"""
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        # doc 0: 'a b c d e' * 3 -> every 5-gram window repeats
        "(0, 'a b c d e a b c d e a b c d e'), "
        "(1, 'x y z w v u t s r q p o'), "
        # doc 2: one repeated 5-gram with a gap -> PARTIAL coverage
        # (pins the interval-union sweep away from the 0/1 extremes)
        "(2, 'a b c d e a b c d e x y z w v')"
        ") AS t(doc_id, text)"
    )
    df = con.execute(all_oracles()["q_text_repetition_rules"]).df().set_index(
        "doc_id"
    )
    total0 = len("a b c d e a b c d e a b c d e")  # 29 chars
    # doc 0: every one of the 11 5-gram windows repeats, so the
    # duplicated-gram character COVERAGE is the whole document
    assert df.loc[0, "dup5_frac"] == 1.0
    assert df.loc[0, "r_dup5"] == 0  # 1.0 >> 0.15 -> rule fails
    assert df.loc[0, "keep"] == 0
    # top 2-gram of doc 0: 'a b' (or any rotation) occurs 3x, 3 chars
    assert df.loc[0, "top2_frac"] == (3 * 3) / total0
    # doc 1: all tokens distinct -> every dup frac 0, top fracs 1-occ
    assert df.loc[1, "dup5_frac"] == 0
    assert df.loc[1, "top2_frac"] == (1 * 3) / len("x y z w v u t s r q p o")
    # doc 2: only 'a b c d e' repeats (positions 1 and 6); spans are
    # chars [1, 9] and [11, 19] -> union 18 of 29 chars
    assert df.loc[2, "dup5_frac"] == 18 / 29
    assert df.loc[2, "r_dup5"] == 0
    # its 6..10-gram windows are all distinct -> coverage 0
    assert df.loc[2, "dup6_frac"] == 0


def test_banding_sweep_matches_python_replay():
    """q_dedup_banding_sweep: the MMDS S-curve sweep re-derived in pure
    python — brute-force exact Jaccard pairs (>= 0.95) over the raw
    fixture, the engines' square-and-multiply collision probability
    replayed multiply-for-multiply (python floats ARE IEEE doubles, so
    the tree reproduces bit-exactly), the same round(p*1e12) bigint
    quantization — so the shared generated SQL cannot hide a formula
    error in both engines at once."""
    docs = _docs(SF01)
    got = _oracle("q_dedup_banding_sweep", SF01).set_index("rows_per_band")
    sets = {int(r.doc_id): frozenset(r.text.split(" ")) for r in docs.itertuples()}
    ids = sorted(sets)
    jacs = []
    for i, a in enumerate(ids):
        sa = sets[a]
        for b2 in ids[i + 1 :]:
            sb = sets[b2]
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.95:
                jacs.append(inter / (len(sa) + len(sb) - inter))
    assert jacs, "fixture must contain >= 0.95 near-dup pairs"

    def powm(x: float, k: int) -> float:
        if k == 1:
            return x
        if k % 2 == 0:
            h = powm(x, k // 2)
            return h * h
        return powm(x, k - 1) * x

    grid = [(96, 1), (48, 2), (32, 3), (24, 4), (16, 6), (12, 8), (8, 12), (6, 16)]
    assert len(got) == len(grid)
    for b, r in grid:
        row = got.loc[r]
        assert row["bands"] == b
        assert row["s_star"] == round((1.0 / b) ** (1.0 / r), 6)
        assert row["p_at_050"] == round(1.0 - (1.0 - 0.5**r) ** b, 6)
        assert row["p_at_080"] == round(1.0 - (1.0 - 0.8**r) ** b, 6)
        assert row["n_pairs"] == len(jacs)
        sq = sum(
            _round_half_away((1.0 - powm(1.0 - powm(j, r), b)) * 1e12)
            for j in jacs
        )
        assert row["exp_recall"] == round(sq / 1e12 / len(jacs), 6), (b, r)
        assert row["exp_candidates"] == round(sq / 1e12, 4), (b, r)
    # the S-curve structure itself: more rows per band -> sharper curve
    # -> lower false-candidate exposure at s=0.5; recall over >= 0.95
    # pairs stays near 1 for the wide-band configs
    p05 = [got.loc[r, "p_at_050"] for _, r in grid]
    assert p05 == sorted(p05, reverse=True)
    assert got.loc[1, "exp_recall"] == 1.0  # b=96, r=1 catches everything


def test_dedup_cascade_matches_python_replay():
    """q_dedup_cascade: the four-stage funnel (gopher-subset quality ->
    exact -> URL-canonical -> near-dup) re-derived in pure python from
    the raw fixture — every stage flag, every (stage, source) count /
    token sum / fraction-of-raw — so the shared window-keeper SQL shape
    cannot hide a stage-ordering or keeper error in both engines at
    once."""
    docs = duckdb.connect().execute(
        f"SELECT doc_id, source, text FROM read_parquet('{SF01}/documents.parquet')"
    ).df()
    got = _oracle("q_dedup_cascade", SF01).set_index(["stage", "source"])
    flags = {}
    for r in docs.itertuples():
        did, toks = int(r.doc_id), r.text.split(" ")
        n = len(toks)
        mean = sum(len(t) for t in toks) / n
        symbol = (r.text.count("#") + r.text.count("...")) / n
        alpha = sum(1 for t in toks if re.search("[A-Za-z]", t)) / n
        s_q = 50 <= n <= 100000 and 3 <= mean <= 10 and symbol <= 0.1 and alpha >= 0.8
        hosts = ["WWW.Example.COM", "www.example.com", "www.EXAMPLE.com"]
        url = (
            f"https://{hosts[did % 3]}{':443' if did % 4 == 0 else ''}"
            f"/page/{did % 400}{'/' if did % 2 == 0 else ''}"
            + (f"?utm_source={r.source}" if did % 5 == 0 else "")
        )
        canon = re.sub(
            ":443", "", re.sub("/$", "", re.sub(r"\?.*$", "", url))
        ).lower()
        flags[did] = {
            "source": r.source, "n_tokens": n, "text": r.text,
            "canon": canon, "set": frozenset(toks), "s_q": s_q,
        }
    # exact keeper among quality survivors, per text group
    keeper: dict[str, int] = {}
    for did, v in flags.items():
        if v["s_q"]:
            keeper[v["text"]] = min(keeper.get(v["text"], did), did)
    for did, v in flags.items():
        v["s_e"] = v["s_q"] and keeper[v["text"]] == did
    ukeeper: dict[str, int] = {}
    for did, v in flags.items():
        if v["s_e"]:
            ukeeper[v["canon"]] = min(ukeeper.get(v["canon"], did), did)
    for did, v in flags.items():
        v["s_u"] = v["s_e"] and ukeeper[v["canon"]] == did
    surv = sorted(did for did, v in flags.items() if v["s_u"])
    dup_b = set()
    for i, a in enumerate(surv):
        sa = flags[a]["set"]
        for b in surv[i + 1 :]:
            sb = flags[b]["set"]
            inter = len(sa & sb)
            if inter and inter / (len(sa) + len(sb) - inter) >= 0.95:
                dup_b.add(b)
    for did, v in flags.items():
        v["s_n"] = v["s_u"] and did not in dup_b
    names = {0: "raw", 1: "quality", 2: "exact", 3: "url", 4: "neardup"}
    cells: dict[tuple, list[int]] = {}
    for did, v in flags.items():
        for st, key in ((0, None), (1, "s_q"), (2, "s_e"), (3, "s_u"), (4, "s_n")):
            if key is None or v[key]:
                c = cells.setdefault((st, v["source"]), [0, 0])
                c[0] += 1
                c[1] += v["n_tokens"]
    assert len(got) == len(cells)
    for (st, src), (nd, nt) in cells.items():
        row = got.loc[(st, src)]
        assert row["stage_name"] == names[st], (st, src)
        assert row["n_docs"] == nd and row["n_tokens"] == nt, (st, src)
        raw = cells[(0, src)][0]
        assert row["pct_docs"] == round(nd / raw, 6), (st, src)
    # funnel structure: monotone non-increasing; quality and near-dup
    # genuinely remove docs on this fixture (exact removes 0 — the
    # corpus has no exact text duplicates, FIXTURES.md; URL collisions
    # among survivors may also be absorbed by earlier stages)
    tot = {st: sum(v[0] for (s, _), v in cells.items() if s == st) for st in names}
    assert tot[0] > tot[1] >= tot[2] >= tot[3] > tot[4]


def test_domain_mixture_matches_python_replay():
    """q_doc_domain_mixture: the DoReMi-style EG reweighting (Xie et
    al. 2023) re-derived in pure python — unigram counts, Laplace
    smoothing, quantized-ln excess (domain-vs-corpus KL), quantized-exp
    softmax — from the raw fixture."""
    docs = duckdb.connect().execute(
        f"SELECT source, text FROM read_parquet('{SF01}/documents.parquet')"
    ).df()
    got = _oracle("q_doc_domain_mixture", SF01).set_index("source")
    cw: dict[tuple, int] = {}
    n_docs: dict[str, int] = {}
    for r in docs.itertuples():
        n_docs[r.source] = n_docs.get(r.source, 0) + 1
        for w in r.text.split(" "):
            cw[(r.source, w)] = cw.get((r.source, w), 0) + 1
    t_d: dict[str, int] = {}
    c_w: dict[str, int] = {}
    for (s, w), c in cw.items():
        t_d[s] = t_d.get(s, 0) + c
        c_w[w] = c_w.get(w, 0) + c
    T, V = sum(c_w.values()), len(c_w)
    assert len(got) == len(t_d)

    def qln(num: int, den: int) -> int:
        return _round_half_away(math.log(num / den) * 1_000_000_000)

    logits = {}
    for s in t_d:
        ex = sum(
            c * (qln(c + 1, t_d[s] + V) - qln(c_w[w] + 1, T + V))
            for (src, w), c in cw.items()
            if src == s
        )
        row = got.loc[s]
        assert row["n_docs"] == n_docs[s]
        assert row["n_tokens"] == t_d[s]
        assert row["token_share"] == t_d[s] / T
        excess = ex / 1_000_000_000 / t_d[s]
        assert abs(row["excess_loss"] - excess) < 1e-12, s
        share_lq = qln(t_d[s], 1) - qln(T, 1)
        logits[s] = share_lq / 1_000_000_000 + excess
    m = max(logits.values())
    eq = {s: _round_half_away(math.exp(lg - m) * 1_000_000_000_000)
          for s, lg in logits.items()}
    se = sum(eq.values())
    for s in t_d:
        w = eq[s] / se
        # both sides round(…, 6); allow one 1e-6 step for a last-ulp
        # libm exp difference flipping a quantization boundary
        assert abs(got.loc[s, "mixture_weight"] - round(w, 6)) <= 1e-6, s
        assert abs(got.loc[s, "upsample"] - round(w / (t_d[s] / T), 6)) <= 1e-6, s
    # EG direction: the domain with the largest excess loss must be
    # upsampled, the smallest downsampled (the DoReMi property)
    hi = max(t_d, key=lambda s: logits[s] - math.log(t_d[s] / T))
    lo = min(t_d, key=lambda s: logits[s] - math.log(t_d[s] / T))
    assert got.loc[hi, "upsample"] > 1.0
    assert got.loc[lo, "upsample"] < 1.0


def test_pii_redact_matches_python_replay():
    """q_text_pii_redact: the synthesis AND the detection re-run with a
    THIRD regex engine (python re, distinct from Spark's Java regex and
    DuckDB's RE2) over the raw fixture — counts, verdicts, and the
    three-pass redacted text must agree string-for-string."""
    docs = _docs(SF01)
    got = _oracle("q_text_pii_redact", SF01).set_index("doc_id")
    assert len(got) == len(docs)
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b")
    ip = re.compile(r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")
    n_with_pii = 0
    for r in docs.itertuples():
        did = int(r.doc_id)
        t = r.text
        if did % 7 == 0:
            t += f" contact user{did}@example.com"
        if did % 11 == 0:
            t += f" call 555-{did % 900 + 100}-{did % 9000 + 1000}"
        if did % 13 == 0:
            t += f" from 10.{did % 256}.{(did // 7) % 256}.{(did // 3) % 256}"
        row = got.loc[did]
        ne, np_, ni = len(email.findall(t)), len(phone.findall(t)), len(ip.findall(t))
        assert row["n_emails"] == ne, did
        assert row["n_phones"] == np_, did
        assert row["n_ips"] == ni, did
        assert row["has_pii"] == int(ne + np_ + ni > 0), did
        red = ip.sub("|IP|", phone.sub("|PHONE|", email.sub("|EMAIL|", t)))
        assert row["redacted"] == red, did
        # the synthesis is the known answer: injected PII is detected
        assert ne == (1 if did % 7 == 0 else 0), did
        assert np_ == (1 if did % 11 == 0 else 0), did
        assert ni == (1 if did % 13 == 0 else 0), did
        n_with_pii += int(ne + np_ + ni > 0)
    assert n_with_pii > 0  # the detector path is genuinely exercised


def test_url_fuzzy_matches_python_replay():
    """q_dedup_url_fuzzy: URL synthesis (corpus-scaled stem modulus),
    path trigram sets, (rdomain, stem)-blocked Jaccard, and the
    lower-id verdict re-derived in pure python from doc_ids alone."""
    docs = duckdb.connect().execute(
        f"SELECT doc_id FROM read_parquet('{SF01}/documents.parquet')"
    ).df()
    got = _oracle("q_dedup_url_fuzzy", SF01).set_index("doc_id")
    assert len(got) == len(docs)
    modulus = max(math.ceil(len(docs) / 8.0), 1)
    hosts = ["www.example.com", "mirror.example.com", "cdn.example.com"]
    segs = ["article", "articles", "artcile", "article"]
    sufs = ["", ".html", "/", "-v2", ""]
    info = {}
    for did in docs.doc_id.astype(int):
        path = f"/{segs[did % 4]}/item-{did % modulus}{sufs[did % 5]}"
        grams = (
            {path[i : i + 3] for i in range(len(path) - 2)}
            if len(path) >= 3
            else set()
        )
        host = hosts[did % 3]
        rdom = ".".join(host.split(".")[-2:])
        info[did] = (host + path, rdom, str(did % modulus), grams)
    by_block: dict[tuple, list[int]] = {}
    for did, (_, rdom, stem, _) in info.items():
        by_block.setdefault((rdom, stem), []).append(did)
    for did, (url, rdom, stem, grams) in info.items():
        row = got.loc[did]
        assert row["url"] == url and row["stem"] == stem
        assert row["rdomain"] == rdom
        assert row["n_grams"] == len(grams)
        near = []
        for other in by_block[(rdom, stem)]:
            if other >= did:
                continue
            og = info[other][3]
            if min(len(og), len(grams)) / max(len(og), len(grams)) < 0.6:
                continue
            inter = len(og & grams)
            jac = inter / (len(og) + len(grams) - inter)
            if jac >= 0.6:
                near.append((jac, other))
        assert row["n_near_lower"] == len(near), did
        assert row["kept"] == int(not near), did
        if near:
            bj, bid = max((j, -o) for j, o in near)
            assert row["best_match_id"] == -bid, did
            assert abs(row["best_jaccard"] - bj) <= 5.1e-5, did
        else:
            assert pd.isna(row["best_match_id"]), did


def _r16_lines_gopher(d: int, toks: list[str]) -> list[str]:
    """The q_text_gopher_lines deterministic line synthesis (8-word
    lines, modulus-driven bullet/ellipsis decoration, duplicate-line
    injection) re-derived in pure python."""
    nl = (len(toks) + 7) // 8

    def dec(i: int) -> str:
        b = "- " if (d + i) % (d % 4 + 1) == 0 else ""
        e = " ..." if (d * 3 + i) % ((d % 3) * 2 + 1) == 0 else ""
        return b + " ".join(toks[i * 8:i * 8 + 8]) + e

    line0 = dec(0)
    return [
        line0
        if ((d % 5 == 3 and i % 3 == 2) or (d % 5 == 1 and i % 6 == 5))
        else dec(i)
        for i in range(nl)
    ]


def test_gopher_lines_matches_python_replay():
    """q_text_gopher_lines: the Gopher Table A1 LINE-family metrics
    (Rae et al. 2021 — bullet-start fraction, ellipsis-end fraction,
    duplicate-line fraction, duplicate-line character fraction) and
    published-threshold flags re-derived in pure python from the raw
    documents fixture, line synthesis included."""
    got = _oracle("q_text_gopher_lines").set_index("doc_id")
    docs = _docs()
    assert len(got) == len(docs)
    fails = {k: 0 for k in ("r_bullet", "r_ellipsis", "r_dup_line", "r_dup_char")}
    for r in docs.itertuples():
        d = int(r.doc_id)
        lines = _r16_lines_gopher(d, r.text.split(" "))
        nl = len(lines)
        fb = sum(1 for l in lines if l.startswith("- ")) / nl
        fe = sum(1 for l in lines if l.endswith("...")) / nl
        distinct = set(lines)
        dl = (nl - len(distinct)) / nl
        ca = sum(len(l) for l in lines)
        dc = (ca - sum(len(l) for l in distinct)) / ca
        rules = [fb <= 0.90, fe <= 0.30, dl <= 0.30, dc <= 0.20]
        row = got.loc[d]
        assert row["n_lines"] == nl
        assert abs(row["frac_bullet_lines"] - fb) < 1e-12
        assert abs(row["frac_ellipsis_lines"] - fe) < 1e-12
        assert abs(row["dup_line_frac"] - dl) < 1e-12
        assert abs(row["dup_line_char_frac"] - dc) < 1e-12
        flags = [row["r_bullet"], row["r_ellipsis"], row["r_dup_line"],
                 row["r_dup_char"]]
        assert flags == [int(x) for x in rules]
        assert row["keep"] == int(all(rules))
        for k, ok in zip(fails, rules):
            fails[k] += int(not ok)
    # every published rule must fire on a nontrivial fixture subset —
    # a rule that never rejects is untested synthesis, not coverage
    assert all(v > 0 for v in fails.values()), fails


def test_c4_rules_matches_python_replay():
    """q_text_c4_rules: the C4 cleaning heuristics (Raffel et al. 2020
    §2.2 — terminal-punctuation/5-word/javascript line filter, lorem
    ipsum + curly-brace page removal, >= 3 retained sentences)
    re-derived in pure python from the raw fixture, line synthesis
    included."""
    got = _oracle("q_text_c4_rules").set_index("doc_id")
    docs = _docs()
    assert len(got) == len(docs)
    seen = {"lorem": 0, "brace": 0, "short": 0}
    for r in docs.itertuples():
        d = int(r.doc_id)
        toks = r.text.split(" ")
        lines = []
        for i in range((len(toks) + 7) // 8):
            p = "javascript " if (d * 7 + i) % 11 == 0 else ""
            t = "." if (d + i) % (d % 3 + 2) != 0 else ""
            lines.append(p + " ".join(toks[i * 8:i * 8 + 8]) + t)
        if d % 13 == 0:
            lines.append("lorem ipsum dolor.")
        if d % 11 == 0:
            lines.append("function() {")
        kept = [
            l for l in lines
            if l.endswith((".", "!", "?", '"'))
            and len(l.split(" ")) >= 5
            and "javascript" not in l
        ]
        total_w = sum(len(l.split(" ")) for l in lines)
        kept_w = sum(len(l.split(" ")) for l in kept)
        has_lorem = int(any("lorem ipsum" in l for l in lines))
        has_brace = int(any("{" in l for l in lines))
        keep = int(len(kept) >= 3 and not has_lorem and not has_brace)
        row = got.loc[d]
        assert row["n_lines"] == len(lines)
        assert row["n_kept_lines"] == len(kept)
        assert row["kept_words"] == kept_w
        assert abs(row["retained_word_frac"] - kept_w / total_w) < 1e-12
        assert row["has_lorem"] == has_lorem
        assert row["has_brace"] == has_brace
        assert row["keep"] == keep
        seen["lorem"] += has_lorem
        seen["brace"] += has_brace
        seen["short"] += int(len(kept) < 3)
    assert all(v > 0 for v in seen.values()), seen


def test_ccnet_buckets_matches_python_replay():
    """q_text_ccnet_buckets: CCNet head/middle/tail partitioning
    (Wenzek et al. 2020 §4.4) re-derived in pure python — corpus
    unigram LM, quantized-ln per-doc NLL fold, per-language ntile(3)
    with SQL-standard bucket sizing, per-bucket ceiling — from the
    raw documents fixture."""
    docs = _docs()
    tok_of = {
        int(r.doc_id): re.findall("[a-z]+", r.text.lower())
        for r in docs.itertuples()
    }
    lang_of = {int(r.doc_id): r.lang for r in docs.itertuples()}
    freq: dict[str, int] = {}
    for ts in tok_of.values():
        for w in ts:
            freq[w] = freq.get(w, 0) + 1
    n = sum(freq.values())
    qlp = {
        w: int(_round_half_away(math.log(c / n) * 1_000_000_000))
        for w, c in freq.items()
    }
    nll = {
        d: -sum(qlp[w] for w in ts) / 1_000_000_000 / len(ts)
        for d, ts in tok_of.items()
    }
    # SQL-standard ntile(3): first (count % 3) buckets get one extra row
    bucket: dict[int, int] = {}
    ceiling: dict[tuple[str, int], float] = {}
    for lg in sorted(set(lang_of.values())):
        members = sorted(
            [d for d in tok_of if lang_of[d] == lg],
            key=lambda d: (nll[d], d),
        )
        cnt = len(members)
        base, rem = divmod(cnt, 3)
        sizes = [base + 1] * rem + [base] * (3 - rem)
        pos = 0
        for b, sz in enumerate(sizes, start=1):
            for d in members[pos:pos + sz]:
                bucket[d] = b
                ceiling[(lg, b)] = max(
                    ceiling.get((lg, b), float("-inf")), nll[d]
                )
            pos += sz
    got = _oracle("q_text_ccnet_buckets").set_index("doc_id")
    assert len(got) == len(tok_of)
    names = {1: "head", 2: "middle", 3: "tail"}
    for d, ts in tok_of.items():
        row = got.loc[d]
        assert row["lang"] == lang_of[d]
        assert row["n_tokens"] == len(ts)
        assert abs(row["nll_per_token"] - nll[d]) < 5.1e-5, d
        assert row["bucket_id"] == bucket[d], d
        assert row["bucket"] == names[bucket[d]], d
        assert abs(
            row["bucket_ceiling_nll"] - ceiling[(lang_of[d], bucket[d])]
        ) < 5.1e-5, d
    # heads must sit at or below their language's middle/tail ceilings
    for lg in set(lang_of.values()):
        assert (
            ceiling[(lg, 1)] <= ceiling[(lg, 2)] <= ceiling[(lg, 3)]
        ), lg
