"""Sessionization: gap-based session assignment + per-session rollups
over an event stream — the classic behavioral-analytics window op a
transcript/event pipeline runs daily, expressed as pure DataFrame
window functions (whole-stage JVM, no Python).

Scale shape: exactly one hash shuffle on the entity column (required —
session boundaries are a per-entity total order), then two window
passes and a partial-aggregated groupBy within the same partitioning
(Spark reuses the exchange). Skew note: one hyperactive entity pins
one task for its own rows only; at 100 TB cap per-entity history
upstream or bucket by (entity, coarse time) if a single entity's
events exceed task memory — the gap semantics then hold within each
coarse bucket.

Determinism: the window orders by (ts, id) so equal timestamps break
ties identically in any engine — a DuckDB oracle reproduces session
ids exactly.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(df: DataFrame, entity_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_seconds: int = 1800) -> DataFrame:
    """Tag every event with its session index: a new session starts at
    the entity's first event and whenever the gap since the previous
    event exceeds ``gap_seconds``. Adds ``session_idx`` (0-based per
    entity, in (ts, id) order)."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    prev = F.lag(us).over(w)
    new_sess = F.when(
        prev.isNull() | (us - prev > gap_seconds * 1_000_000),
        F.lit(1)).otherwise(F.lit(0))
    idx = (F.sum(new_sess)
           .over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1)
    return df.withColumn("session_idx", idx.cast("long"))


def session_stats(df: DataFrame, entity_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap_seconds: int = 1800) -> DataFrame:
    """Per-session rollup: event count, start/end, duration seconds.
    One row per (entity, session_idx)."""
    s = sessionize(df, entity_col, ts_col, id_col, gap_seconds)
    return (s.groupBy(entity_col, "session_idx")
             .agg(F.count("*").cast("long").alias("n_events"),
                  F.min(ts_col).alias("t_start"),
                  F.max(ts_col).alias("t_end"),
                  ((F.unix_micros(F.max(ts_col))
                    - F.unix_micros(F.min(ts_col))) / 1_000_000.0)
                  .alias("duration_s"),
                  F.min(id_col).cast("long").alias("first_id"),
                  F.max(id_col).cast("long").alias("last_id")))
