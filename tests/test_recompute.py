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
