"""Streaming drift monitor: v05's PSI report over a live event stream.

The production posture for v05 (`queries/validation_q.py`): the
baseline window's bin counts are computed ONCE (a batch job over the
accepted snapshot), and the CURRENT window accumulates continuously —
a streaming aggregation over the monitored-dimension bins whose state
is `|dims| x |bins|` rows (a few dozen — bounded at any corpus size,
which is what makes complete-output-mode + a memory sink a sound
monitor here).  The PSI math is imported from v05, not re-derived, so
batch and stream share the dimension list, the smoothing, the
integer-micro freezing, and the 0.2 threshold by construction; the
test pins `drift_report(base_counts, stream_counts)` equal to the
batch v05 twin over the same rows.

Mechanics pinned by tests/test_streaming_drift.py:
  1. The monitor keeps updating in place: poll after each new file and
     n_curr grows while the baseline side stays fixed.
  2. The final streamed report is row-identical to v05's one-pass batch
     formulation over the union of both windows — two different
     physical strategies (single-pass flag agg vs two-relation
     full-outer join) cross-checking each other.

Scale notes: the stream pays one (col, bin) shuffle per micro-batch
with map-side partials (v05's exact exchange); aggregate state and the
report are bin-relation-sized.  A 100-TB deployment swaps the memory
sink for a Delta/Iceberg report table via foreachBatch — the
aggregation and the report join are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from ..queries.validation_q import _V05_PSI_NUM, _V05_THRESH, _v05_monitored_sql


def monitored_bins(events: DataFrame) -> DataFrame:
    """Explode each event into its (col_name, bin) monitored
    observations — v05's projection, scan-local."""
    mon = F.array(
        *[
            F.struct(F.lit(n).alias("col_name"), F.expr(s).alias("bin"))
            for n, s, _ in _v05_monitored_sql()
        ]
    )
    return events.select(F.explode(mon).alias("m")).select(
        "m.col_name", "m.bin"
    )


def bin_counts(events: DataFrame) -> DataFrame:
    """(col_name, bin, n) counts of one window's monitored bins."""
    return monitored_bins(events).groupBy("col_name", "bin").agg(
        F.count("*").alias("n")
    )


def drift_report(base_counts: DataFrame, curr_counts: DataFrame) -> DataFrame:
    """v05's report (col_name, n_bins, n_base, n_curr, psi_micro,
    drifted) from two separately-aggregated count relations.

    Bins observed in only one window full-outer-join in with count 0 —
    identical semantics to v05's single-pass flag aggregation (the
    batch twin test pins the equality)."""
    b = base_counts.select("col_name", "bin", F.col("n").alias("nb"))
    c = curr_counts.select("col_name", "bin", F.col("n").alias("nc"))
    joined = b.join(c, ["col_name", "bin"], "full_outer").select(
        "col_name",
        "bin",
        F.coalesce("nb", F.lit(0)).alias("nb"),
        F.coalesce("nc", F.lit(0)).alias("nc"),
    )
    wc = W.partitionBy("col_name")
    tot = joined.select(
        "col_name",
        "nb",
        "nc",
        F.sum("nb").over(wc).alias("n_base"),
        F.sum("nc").over(wc).alias("n_curr"),
        F.count("*").over(wc).alias("k"),
    )
    contrib = tot.select(
        "col_name",
        "n_base",
        "n_curr",
        "k",
        F.round(F.expr(_V05_PSI_NUM.format(b="nb", c="nc")))
        .cast("long")
        .alias("cm"),
    )
    return contrib.groupBy("col_name").agg(
        F.max("k").cast("long").alias("n_bins"),
        F.max("n_base").cast("long").alias("n_base"),
        F.max("n_curr").cast("long").alias("n_curr"),
        F.sum("cm").alias("psi_micro"),
        (F.sum("cm") > _V05_THRESH).alias("drifted"),
    )


def start_monitor(stream_events: DataFrame, query_name: str):
    """Start the current-window bin-count aggregation over a streaming
    events DataFrame; the live counts land in the in-memory table
    `query_name` (complete mode — state is bin-relation-sized)."""
    counts = (
        monitored_bins(stream_events)
        .groupBy("col_name", "bin")
        .agg(F.count("*").alias("n"))
    )
    return (
        counts.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )


def current_report(
    spark, base_counts: DataFrame, query_name: str
) -> DataFrame:
    """The drift report against the monitor's CURRENT accumulated
    counts (read from the in-memory table)."""
    return drift_report(base_counts, spark.table(query_name))
