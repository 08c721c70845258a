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
