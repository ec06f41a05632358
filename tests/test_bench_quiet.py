"""Unit tests for bench.py's quiet-floor selection (VERDICT r11 task
5): every recorded artifact so far had value_quiet == value — no
stall ever hit the final numbers — so the quiet-derivation path was
untested exactly where it matters. These feed SYNTHETIC probe/sample
arrays through the pure summarize_bench and pin:

- a burst-hit sample is excluded from quiet_s / value_quiet,
- an all-stalled query falls back to its global min in value_quiet
  and is listed in stalled_queries,
- probe_quiet_suspect fires when the whole run's best probe exceeds
  the absolute ceiling, and then NULLS every quiet field (ADVICE
  r11: a host steadily at ~1 s turnaround trips neither per-sample
  rule, so the "engine numbers" must not be quotable without the
  suspicion flag),
- the late-quiet-window floor retroactively reclassifies early
  samples.

No SparkSession — pure arithmetic over dicts.
"""

from __future__ import annotations

import importlib.util
import os

_BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")
_spec = importlib.util.spec_from_file_location("bench_module", _BENCH)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

CEILING = 400.0


def _run(samples, probes, probes_all=None):
    all_p = probes_all or [p for ps in probes.values() for p in ps]
    return bench.summarize_bench(samples, probes, all_p, CEILING)


def test_burst_sample_excluded_from_quiet():
    """Mixed query: one burst-inflated sample (probe 10x the floor)
    may still set the global-min value if fastest, but quiet_s must
    come from the non-stalled samples only."""
    out = _run(
        {"q": [9.4, 3.1, 3.0]},
        {"q": [1200.0, 100.0, 110.0]},
    )
    assert out["queries"]["q"] == 3.0
    assert out["queries_quiet"]["q"] == 3.0
    assert out["probes"]["q"]["stalled"] is False
    assert out["stalled_queries"] == []
    assert out["probe_quiet_suspect"] is False
    assert out["value"] == out["value_quiet"] == 3.0

    # Same shapes but the BURST sample is the fastest (short query
    # finished before the burst landed on the probe): value keeps the
    # global min, quiet_s must NOT.
    out = _run(
        {"q": [2.0, 3.1, 3.0]},
        {"q": [1200.0, 100.0, 110.0]},
    )
    assert out["queries"]["q"] == 2.0
    assert out["queries_quiet"]["q"] == 3.0
    assert out["value"] == 2.0
    assert out["value_quiet"] == 3.0


def test_all_stalled_query_flagged_and_falls_back():
    """Every sample of one query burst-hit: stalled flag set, quiet_s
    None, value_quiet falls back to that query's global min while the
    other query contributes its quiet floor."""
    out = _run(
        {"hot": [12.0, 11.5], "cold": [1.0, 0.9]},
        {"hot": [2000.0, 1900.0], "cold": [100.0, 105.0]},
    )
    assert out["probes"]["hot"]["stalled"] is True
    assert out["probes"]["hot"]["quiet_s"] is None
    assert out["stalled_queries"] == ["hot"]
    assert out["queries_quiet"]["cold"] == 0.9
    # fallback: hot contributes its global min (11.5), cold its quiet
    assert out["value_quiet"] == 12.4
    assert out["value"] == 12.4
    assert out["probe_quiet_suspect"] is False


def test_suspect_run_nulls_all_quiet_fields():
    """ADVICE r11: host sitting steadily at ~1 s scheduler turnaround
    — every probe above the 400 ms ceiling but none above the 3x
    absolute stall line (1200 ms). Per-sample rules all pass, yet the
    whole run is uniformly inflated: suspect must fire and the quiet
    fields must be nulled so they cannot be quoted flag-free."""
    out = _run(
        {"a": [5.0, 5.1], "b": [2.0, 2.2]},
        {"a": [1000.0, 1100.0], "b": [1050.0, 1000.0]},
    )
    assert out["probe_quiet_suspect"] is True
    # the per-sample rules indeed never fired...
    assert out["stalled_queries"] == []
    # ...and yet no quiet number survives to be quoted.
    assert out["value_quiet"] is None
    assert out["queries_quiet"] == {"a": None, "b": None}
    assert all(d["quiet_s"] is None for d in out["probes"].values())
    # the raw global mins remain recorded (and remain suspect-flagged)
    assert out["value"] == 7.0


def test_late_quiet_window_reclassifies_early_samples():
    """The floor is the min over the WHOLE run's probes: an early
    query measured only under load becomes stalled once a later query
    finds the true quiet floor — min-of-N with probe certification,
    not first-come-first-believed."""
    # Early query: probes ~900 ms. If the floor were its own min
    # (900), nothing is stalled (rule is >3x floor). A later query
    # probes at 100 ms -> floor 100 -> 900 > 300 -> early samples
    # reclassified as stalled.
    out = _run(
        {"early": [4.0, 4.2], "late": [1.0]},
        {"early": [900.0, 950.0], "late": [100.0]},
    )
    assert out["probes"]["early"]["stalled"] is True
    assert out["stalled_queries"] == ["early"]
    assert out["queries_quiet"]["early"] is None
    assert out["value_quiet"] == 5.0  # early falls back to 4.0 + late 1.0
    assert out["probe_quiet_suspect"] is False


def test_absolute_ceiling_backstop_with_inflated_in_process_floor():
    """The always-loaded-host backstop: every in-process probe is
    ~5 s, so the relative rule's floor is itself burst-inflated and
    never fires — the absolute 3x-ceiling rule must still flag every
    sample AND the run must read suspect."""
    out = _run(
        {"q": [30.0, 31.0]},
        {"q": [5000.0, 5200.0]},
    )
    assert out["probe_quiet_suspect"] is True
    assert out["probes"]["q"]["stalled"] is True
    assert out["stalled_queries"] == ["q"]
    assert out["value_quiet"] is None
    assert out["value"] == 30.0
