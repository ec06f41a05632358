"""Public accessor module: importing it populates the full query
registry (each operator module registers its queries on import)."""

from __future__ import annotations

from . import queries as core_queries  # noqa: F401  (relational/window/scalar core)
from .operators import asof, dedup, dsp, multimodal, similarity, text_analysis  # noqa: F401
from .plans import pipeline  # noqa: F401
from .registry import REGISTRY, bench_queries, oracles, queries  # noqa: F401
from .sinks import exports  # noqa: F401
from .streaming import stateful, windows  # noqa: F401

__all__ = ["REGISTRY", "bench_queries", "oracles", "queries"]
