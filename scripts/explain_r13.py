"""Dump .explain("formatted") for a named set of registered queries
(r13 optimization round before/after evidence).

Run: python scripts/explain_r13.py <outdir> <query> [<query> ...]
     (sf dir from $SPARK_GRAFT_SF_DIR, default sf0.01 — plan shape
     only, so the small fixture is enough and fast)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, ".")

from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402


def explain_str(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="explain_r13")
    from asr_training_data_pipeline_spark.api import REGISTRY

    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        text = explain_str(df)
        with open(os.path.join(outdir, f"{name}.txt"), "w") as fh:
            fh.write(text)
        print(f"{name}: {len(text)} chars")
    spark.stop()


if __name__ == "__main__":
    main()
