"""Schema-agnostic compound-header unpivot (wide -> long).

Reference semantics (NOT code): docpact unpivot.py:143-272 detects
repeating ``prefix / suffix`` header groups — fuzzy-matching the suffix
lists across groups (fuzz.ratio >= 85, greedy) — and unpivots each
suffix group into long rows carrying a ``_pivot`` column
(unpivot.py:275-400).

Spark-first re-expression: in a DataFrame the "headers" are the schema,
so group detection runs driver-side on column names (tiny, no data
touched) and the unpivot itself is ONE ``stack()`` projection — a
narrow map Catalyst pipelines into the scan: no shuffle, no union of
per-suffix branches, output rows = input rows x n_suffixes. At 10^12
rows that is the only shape that works: the alternative per-suffix
``union`` re-scans the input once per suffix.

Fuzzy suffix matching uses difflib.SequenceMatcher.ratio (stdlib,
deterministic) in place of the reference's rapidfuzz ratio; both are
normalized-similarity >= threshold gates.
"""

from __future__ import annotations

from difflib import SequenceMatcher

from pyspark.sql import DataFrame, functions as F

SEP = " / "
MIN_RATIO = 0.85  # unpivot.py:116 fuzz.ratio >= 85 analogue


def _ratio(a: str, b: str) -> float:
    return SequenceMatcher(None, a.lower(), b.lower()).ratio()


def detect_pivot_groups(
    columns: list[str], sep: str = SEP, min_ratio: float = MIN_RATIO
) -> tuple[list[str], dict[str, dict[str, str]]]:
    """Detect repeating compound-header groups in a column list.

    Returns ``(id_cols, groups)`` where ``groups`` maps a canonical
    suffix (first-seen form) to ``{prefix: original_column}``. Suffixes
    are first grouped exactly, then near-identical suffix spellings
    ("FY 1995" vs "FY1995") are greedily merged in first-seen order when
    their similarity >= min_ratio AND their prefix sets don't collide —
    the reference's greedy suffix-list fuzzy match."""
    id_cols = [c for c in columns if sep not in c]
    exact: dict[str, dict[str, str]] = {}
    order: list[str] = []
    for c in columns:
        if sep not in c:
            continue
        prefix, suffix = c.split(sep, 1)
        prefix, suffix = prefix.strip(), suffix.strip()
        if suffix not in exact:
            exact[suffix] = {}
            order.append(suffix)
        exact[suffix][prefix] = c
    merged: dict[str, dict[str, str]] = {}
    canon: list[str] = []
    for sfx in order:
        target = None
        for c in canon:
            if _ratio(sfx, c) >= min_ratio and not (
                exact[sfx].keys() & merged[c].keys()
            ):
                target = c
                break
        if target is None:
            merged[sfx] = dict(exact[sfx])
            canon.append(sfx)
        else:
            merged[target].update(exact[sfx])
    return id_cols, merged


def detect_and_unpivot(
    df: DataFrame,
    sep: str = SEP,
    min_ratio: float = MIN_RATIO,
    pivot_col: str = "_pivot",
) -> DataFrame:
    """Unpivot every detected compound-header group in one projection.

    Output columns: id columns, ``_pivot`` (canonical suffix), then one
    measure column per distinct prefix (sorted; null where a suffix
    group lacks that prefix). Input without compound headers is returned
    unchanged."""
    id_cols, groups = detect_pivot_groups(df.columns, sep, min_ratio)
    if not groups:
        return df
    prefixes = sorted({p for g in groups.values() for p in g})
    dtypes = dict(df.dtypes)
    # stack() requires each output column's inputs to share one type;
    # mixed types across suffix groups would make the generated SQL
    # ill-typed (first group's type would win silently) — fail loudly.
    ptype: dict[str, str] = {}
    for p in prefixes:
        tys = {dtypes[g[p]] for g in groups.values() if p in g}
        if len(tys) > 1:
            raise ValueError(
                f"unpivot: prefix {p!r} has conflicting column types "
                f"across suffix groups: {sorted(tys)}"
            )
        ptype[p] = tys.pop()
    rows = []
    for sfx, g in groups.items():
        cells = ", ".join(
            f"`{g[p]}`" if p in g else f"CAST(NULL AS {ptype[p]})"
            for p in prefixes
        )
        sfx_lit = sfx.replace("\\", "\\\\").replace("'", "\\'")
        rows.append(f"'{sfx_lit}', {cells}")
    out_cols = ", ".join([pivot_col] + [f"`{p}`" for p in prefixes])
    stack = (
        f"stack({len(groups)}, {', '.join(rows)}) AS ({out_cols})"
    )
    return df.select(*[f"`{c}`" for c in id_cols], F.expr(stack))
