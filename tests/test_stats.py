"""Statistical-operator semantics vs independent numpy recomputation
(engine/stats.py). The differential sweep proves Spark == oracle SQL;
these prove the shared formula IS Welch's t / OLS."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd

from engine.registry import all_oracles

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    con = duckdb.connect()
    return con.execute(
        f"SELECT user_id, event_type, ts, value FROM read_parquet('{SF}/events.parquet')"
    ).df()


def _bucket(uid: int) -> int:
    return int(hashlib.md5(str(uid).encode()).hexdigest()[:8], 16) % 2


def _oracle(key: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    return con.execute(all_oracles()[key]).df()


def test_ttest_matches_numpy_welch():
    ev = _events()
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    ev["arm"] = ev["user_id"].map(_bucket)
    got = _oracle("q_stats_ttest").set_index("event_type")
    for et, g in ev.groupby("event_type"):
        a = g.loc[g["arm"] == 0, "cents"].to_numpy(dtype=np.float64)
        b = g.loc[g["arm"] == 1, "cents"].to_numpy(dtype=np.float64)
        if len(a) < 2 or len(b) < 2:
            assert et not in got.index
            continue
        t = (a.mean() - b.mean()) / np.sqrt(
            a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b)
        )
        row = got.loc[et]
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        assert abs(row["mean_a"] - round(a.mean() / 100, 4)) < 1e-9
        assert abs(row["t_stat"] - round(t, 4)) < 1e-6, et
        # hash-split A/A: no significant difference expected
        assert abs(row["t_stat"]) < 4.0


def test_trend_matches_numpy_lstsq():
    ev = _events()
    ev["cents"] = np.floor(ev["value"] * 100).astype("int64")
    ev["x"] = (pd.to_datetime(ev["ts"]).dt.floor("D")
               - pd.Timestamp("2024-01-01")).dt.days
    got = _oracle("q_stats_trend").set_index("event_type")
    for et, g in ev.groupby("event_type"):
        daily = g.groupby("x")["cents"].sum()
        x, y = daily.index.to_numpy(np.float64), daily.to_numpy(np.float64)
        slope, intercept = np.polyfit(x, y, 1)
        row = got.loc[et]
        assert row["n"] == len(daily)
        assert abs(row["slope_per_day"] - round(slope / 100, 4)) < 1e-6, et
        assert abs(row["intercept"] - round(intercept / 100, 4)) < 1e-4, et


def test_auc_matches_pairwise_definition():
    """The Mann-Whitney rank form must equal the O(n²) pairwise
    definition: P(score_pos > score_neg) + 0.5*P(tie)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    n_pos, n_neg, auc = con.execute(all_oracles()["q_eval_auc"]).fetchone()
    df = con.execute(
        "SELECT CAST(embedding[1] AS DOUBLE) AS s, label % 2 AS y FROM embeddings"
    ).df()
    pos = df.loc[df["y"] == 1, "s"].to_numpy()
    neg = df.loc[df["y"] == 0, "s"].to_numpy()
    assert (len(pos), len(neg)) == (n_pos, n_neg)
    cmp = pos[:, None] - neg[None, :]
    pairwise = ((cmp > 0).sum() + 0.5 * (cmp == 0).sum()) / (len(pos) * len(neg))
    assert abs(auc - round(pairwise, 6)) < 1e-9


def test_auc_tie_handling_is_exact():
    """Average-rank ties: a hand-built multiset with heavy ties has a
    closed-form AUC; check the oracle formula on it via DuckDB."""
    con = duckdb.connect()
    con.execute(
        """CREATE VIEW embeddings AS
           SELECT * FROM (VALUES
             ([0.5], 1), ([0.5], 0), ([0.5], 1), ([0.5], 0),
             ([0.9], 1), ([0.1], 0)
           ) AS t(embedding, label)"""
    )
    n_pos, n_neg, auc = con.execute(all_oracles()["q_eval_auc"]).fetchone()
    # pairs: pos={.5,.5,.9}, neg={.5,.5,.1}: wins = .5>.1 x2, .9>all x3
    # = 5; ties = 2x2 = 4 -> AUC = (5 + 0.5*4)/9
    assert (n_pos, n_neg) == (3, 3)
    assert abs(auc - round((5 + 0.5 * 4) / 9, 6)) < 1e-9


def test_km_matches_manual_estimator():
    """The KM oracle must equal a direct pure-Python Kaplan-Meier
    computation over the same spans (censoring included)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    spans = con.execute("""
        SELECT datediff('day',
                        CAST(min(date_trunc('day', ts)) AS DATE),
                        CAST(max(date_trunc('day', ts)) AS DATE)) AS t,
               CAST(max(date_trunc('day', ts)) AS DATE) AS last_day
        FROM events GROUP BY user_id
    """).fetchall()
    max_day = max(r[1] for r in spans)
    durs = [
        (t, 0 if (max_day - last).days <= 6 else 1) for t, last in spans
    ]
    from collections import Counter

    ending = Counter(t for t, _ in durs)
    churns = Counter(t for t, c in durs if c == 1)
    at_risk = len(durs)
    s = 1.0
    expected = {}
    for t in sorted(ending):
        d = churns.get(t, 0)
        if d < at_risk:
            s *= 1.0 - d / at_risk
            expected[t] = (at_risk, d, round(s, 4) + 0.0)
        at_risk -= ending[t]
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(all_oracles()["q_survival_km"]).fetchall()
    }
    assert got == expected
