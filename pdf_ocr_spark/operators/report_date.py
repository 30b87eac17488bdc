"""Report-date resolution as column expressions.

Reference semantics (NOT code): docpact report_date.py:29-81 resolves a
per-document report date from a declarative config — source ∈
{filename, timestamp, constant, ...}; "filename" in the reference feeds
an LLM with a hint. Here the filename path is deterministic: candidate
date tokens are regex-extracted from the file name and parsed through a
multi-format coalesce (the serialize.py:107-189 many-formats-in
discipline), which covers the reference's test contracts (dates are
literally present in their filenames) without any model call.

Everything is a scalar column expression — no UDF, no shuffle; at
10^12 docs this folds into the scan projection.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# candidate date tokens, tried in order (first match wins)
_PATTERNS = [
    (r"\d{4}-\d{2}-\d{2}", "yyyy-MM-dd"),
    (r"\d{2}\.\d{2}\.\d{4}", "dd.MM.yyyy"),
    (r"(?<!\d)\d{8}(?!\d)", "yyyyMMdd"),
]


def report_date_from_filename(path: Column) -> Column:
    """First parseable date token in the file name, as DateType (null
    when the name carries no recognizable date)."""
    name = F.element_at(F.split(path, "/"), -1)
    # try_to_date: unparseable/empty candidates yield null (ANSI-safe)
    cands = [
        F.try_to_date(
            F.nullif(F.regexp_extract(name, rx, 0), F.lit("")), fmt
        )
        for rx, fmt in _PATTERNS
    ]
    return F.coalesce(*cands)


# content-zone candidates (docpact report_date.py:62-81 "content" source,
# made deterministic: instead of handing the title zone to an LLM, the
# RH1 temporal regexes — heuristics.py:442-506 — extract the date phrase
# and a multi-format coalesce parses it)
_CONTENT_PATTERNS = [
    (r"[Aa]s of ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})", "MMMM d, yyyy"),
    (
        r"[Ff]or the (?:year|period|quarter) ended? ([A-Za-z]+ [0-9]{1,2}, [0-9]{4})",
        "MMMM d, yyyy",
    ),
    (r"(\d{4}-\d{2}-\d{2})", "yyyy-MM-dd"),
    (r"(\d{1,2} [A-Za-z]+ \d{4})", "d MMMM yyyy"),
]


def report_date_from_content(line: Column) -> Column:
    """source == "content": first RH1 temporal phrase in the (title-zone)
    text, parsed to DateType; null when the zone has no date phrase."""
    cands = [
        F.try_to_date(
            F.nullif(F.regexp_extract(line, rx, 1), F.lit("")), fmt
        )
        for rx, fmt in _CONTENT_PATTERNS
    ]
    return F.coalesce(*cands)


def report_date_constant(value: str) -> Column:
    """source == "constant" (report_date.py:44-47)."""
    return F.to_date(F.lit(value))


def report_date_timestamp() -> Column:
    """source == "timestamp" (report_date.py:41-42) — the ingestion
    wall-clock; nondeterministic by definition, excluded from oracle
    comparisons."""
    return F.current_timestamp()
