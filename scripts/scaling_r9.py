"""Round-9 scaling rows (VERDICT r8 task 7 + r9-new operators):

* incremental_agg_retract at 100× events (10M rows) — the one r8
  newcomer whose SCALING row lacked a 100× fixture;
* dsir_importance_weights at sf0.1 and the 500k-doc fixture — the
  constant-size (B=4096) λ-table claim: shuffle should be flat in
  corpus size except the final doc_id aggregation;
* kcenter_coreset at sf0.1 (2k vectors) and the 200k-vector fixture —
  k scans, no corpus-keyed exchange: shuffle ~0 at both scales;
* linkage_cjk_residue on a constructed 50k-doc CJK corpus (25k
  engineered near-dup pairs) — the residue path at the linkage-50k
  scale the projected path was measured at in r8.

Run (quiet host): PYTHONPATH=.:scripts python scripts/scaling_r9.py
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from asr_training_data_pipeline_spark.api import REGISTRY  # noqa: E402
from asr_training_data_pipeline_spark.session import get_spark  # noqa: E402
from scaling_r6_sketch import BIG, build_fixture, shuffle_totals  # noqa: E402

BASE = "/root/testdata/sf0.1"
EV100 = "/tmp/sf_r9_ev100"
CJK50K = "/tmp/sf_r9_cjk50k"


def build_ev100() -> None:
    os.makedirs(EV100, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
COPY (
  SELECT e.event_id + c.i * 10000000 AS event_id,
         e.ts + to_microseconds(c.i) AS ts,
         e.user_id + c.i * 1000000 AS user_id,
         e.event_type, e.value, e.props
  FROM '{BASE}/events.parquet' e,
       (SELECT unnest(range(100)) AS i) c
) TO '{EV100}/events.parquet' (FORMAT PARQUET)
""")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{EV100}/{t}.parquet")


def build_cjk50k() -> None:
    """50k CJK docs: consecutive (even, odd) ids form a cross-source
    pair whose 30-codepoint texts differ in exactly the LAST codepoint
    — 25k engineered dist-1 pairs, all multibyte → all residue-path."""
    os.makedirs(CJK50K, exist_ok=True)
    con = duckdb.connect()
    con.sql(f"""
COPY (
  SELECT i AS doc_id,
         array_to_string(
           [chr(CAST(19968 + ((i // 2) * 31 + j * 7) % 2000 AS INTEGER))
            for j in range(29)],
           '')
         || chr(CAST(19968 + 2100 + ((i // 2) % 400) * 2 + (i % 2)
                     AS INTEGER)) AS text,
         'zh' AS lang,
         CASE WHEN i % 2 = 0 THEN 'src_a' ELSE 'src_b' END AS source,
         CAST(30 AS BIGINT) AS n_chars
  FROM range(50000) t(i)
) TO '{CJK50K}/documents.parquet' (FORMAT PARQUET)
""")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copyfile(f"{BASE}/{t}.parquet", f"{CJK50K}/{t}.parquet")


def main() -> None:
    build_fixture()
    build_ev100()
    build_cjk50k()
    spark = get_spark(
        app_name="scaling_r9",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
        },
    )
    cases = [
        ("dsir_importance_weights", BASE),
        ("dsir_importance_weights", BIG),
        ("kcenter_coreset", BASE),
        ("kcenter_coreset", BIG),
        ("incremental_agg_retract", BASE),
        ("incremental_agg_retract", EV100),
        ("linkage_cjk_residue", CJK50K),
    ]
    print("| query | fixture | wall (s, min of 2) | shuffle write | rows |")
    print("|---|---|---|---|---|")
    for name, sf in cases:
        fn = REGISTRY[name].fn
        walls = []
        n = None
        w0 = shuffle_totals(spark)
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, sf).count()
            walls.append(time.perf_counter() - t0)
        w1 = shuffle_totals(spark)
        tag = {BASE: "sf0.1", BIG: "500k/200k", EV100: "10M ev",
               CJK50K: "50k cjk"}[sf]
        print(
            f"| {name} | {tag} | {min(walls):.1f} "
            f"(samples {[round(w, 1) for w in walls]}) "
            f"| {(w1 - w0) / 2e6:.2f} MB/run | {n} |"
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
