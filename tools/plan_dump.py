"""Dump `.explain("formatted")` for registered keys to plans/<tag>/.

Optimization-round deliverable (r16): the judge cannot run Spark, so
every plan claim in OPTIMIZATION_r{N}.md must be backed by a committed
plan file. Usage:

    python tools/plan_dump.py r16 before q_agg_group q_tpch_q5 ...
    python tools/plan_dump.py r16 after  q_agg_group ...

Writes plans/<tag>/<key>_<stage>.txt (one file per key). The plan is
captured from the same DataFrame the bench times (registry fn at
$SPARK_GRAFT_SF_DIR, default sf0.1), via stdout capture of
df.explain("formatted") — identical text to what a user would see.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, "/root/repo")

from engine.registry import all_queries  # noqa: E402
from engine.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    tag, stage, *keys = sys.argv[1:]
    assert stage in ("before", "after"), stage
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plan_dump")
    queries = all_queries()
    for key in keys:
        df = queries[key](spark, sf_dir)
        path = os.path.join(out_dir, f"{key}_{stage}.txt")
        with open(path, "w") as f:
            f.write(plan_text(df))
        print(f"[plan] {path}")


if __name__ == "__main__":
    main()
