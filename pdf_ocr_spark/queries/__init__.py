"""Query registry: every module exposes QUERIES (name -> (spark, sf_dir)
-> DataFrame) and ORACLE (name -> DuckDB SQL twin)."""

from __future__ import annotations

ALL_QUERIES: dict = {}
ALL_ORACLES: dict = {}

from . import (  # noqa: E402
    analytics_ext,
    classify_q,
    dedup,
    extract_q,
    functions_q,
    multimodal_q,
    schema_map_q,
    setops_arrays,
    similarity,
    textstats,
    tpch,
    validation_q,
    windows,
)

for _mod in (tpch, windows, setops_arrays, functions_q, extract_q, dedup, similarity, textstats, multimodal_q, analytics_ext, validation_q, schema_map_q, classify_q):
    ALL_QUERIES.update(_mod.QUERIES)
    ALL_ORACLES.update(_mod.ORACLE)
