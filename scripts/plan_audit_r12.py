"""Registry-wide physical-plan audit (r12 optimization round).

Plans EVERY registered query at the given sf_dir and greps the
formatted explain output for the optimization guide's red flags:

- Exchange count (shuffles) and which are RoundRobinPartitioning
- Python boundary nodes (BatchEvalPython / ArrowEvalPython /
  MapInPandas / FlatMapGroupsInPandas / MapInArrow)
- CartesianProduct / BroadcastNestedLoopJoin
- join strategies (SortMergeJoin vs BroadcastHashJoin vs
  ShuffledHashJoin)
- parquet scans whose ReadSchema pulls more than N columns, and
  scans with a downstream Filter but empty PushedFilters

Writes one summary line per query to stdout (TSV) and the raw
explain text to --outdir when given. Planning only: the audit calls
explain, not an action — but NOTE some query FUNCTIONS run driver
jobs while BUILDING the frame (eager caches, .first() scalars), so
the sweep does execute those parts.

Run: python scripts/plan_audit_r12.py [sf_dir] [outdir]
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
import time
import traceback

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit_one(name: str, text: str) -> dict:
    flags = {
        "exchanges": len(re.findall(r"\bExchange\b", text)),
        "roundrobin": len(re.findall(r"RoundRobinPartitioning", text)),
        "python": len(
            re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInPandas|"
                r"FlatMapGroupsInPandas|MapInArrow|FlatMapCoGroupsInPandas",
                text,
            )
        ),
        "cartesian": len(re.findall(r"CartesianProduct", text)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", text)),
        "smj": len(re.findall(r"SortMergeJoin", text)),
        "bhj": len(re.findall(r"BroadcastHashJoin", text)),
        "shj": len(re.findall(r"ShuffledHashJoin", text)),
        "sorts": len(re.findall(r"^\s*\+?-?\s*\*?\(?\d*\)?\s*Sort ", text, re.M)),
        "scans": len(re.findall(r"Scan parquet", text)),
        "empty_pushed": len(re.findall(r"PushedFilters: \[\]", text)),
    }
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    outdir = sys.argv[2] if len(sys.argv) > 2 else None
    if outdir:
        os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan_audit_r12")
    from asr_training_data_pipeline_spark.api import REGISTRY

    print(
        "query\texch\trr\tpy\tcart\tbnlj\tsmj\tbhj\tshj\tscans\tempty_pf\tplan_ms"
    )
    for name, qd in REGISTRY.items():
        t0 = time.perf_counter()
        try:
            df = qd.fn(spark, sf_dir)
            text = explain_str(df)
        except Exception:
            print(f"{name}\tERROR")
            traceback.print_exc(file=sys.stderr)
            continue
        ms = (time.perf_counter() - t0) * 1000
        f = audit_one(name, text)
        print(
            f"{name}\t{f['exchanges']}\t{f['roundrobin']}\t{f['python']}\t"
            f"{f['cartesian']}\t{f['bnlj']}\t{f['smj']}\t{f['bhj']}\t"
            f"{f['shj']}\t{f['scans']}\t{f['empty_pushed']}\t{ms:.0f}"
        )
        if outdir:
            with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
                fh.write(text)
    spark.stop()


if __name__ == "__main__":
    main()
