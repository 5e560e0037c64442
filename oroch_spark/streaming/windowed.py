"""Streaming analytics over transcript/event streams: watermarked
windowed aggregation and a custom stateful operator.

The reference has no streaming surface (SURVEY.md §2.6); these are the
Spark-idiomatic extensions the north rule's pipeline needs beyond the
incremental encode (`incremental.py`):

- :func:`windowed_event_counts` — event-time tumbling/sliding window
  counts with a watermark: the built-in streaming aggregation path
  (state store managed by Spark, late rows beyond the watermark
  dropped, windows emitted on close in append mode). At scale this is
  one shuffle on (window, keys) with partial aggregation per
  micro-batch — the same partial-before-exchange shape as the batch
  operators.
- :func:`conversation_progress` — custom stateful operator via
  ``applyInPandasWithState``: per-conversation running state
  (turn count, first/last event time, per-role tallies) maintained by
  the engine's own code, emitted each time the conversation appears in
  a micro-batch (update mode). The state schema is explicit and
  fixed-width, so the state store holds O(active conversations) tiny
  rows — the 100 TB knob is conversation cardinality, not turn count.
"""
from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T


def windowed_event_counts(stream_df: DataFrame, ts_col: str = "ts",
                          window: str = "10 minutes",
                          slide: Optional[str] = None,
                          watermark: str = "10 minutes",
                          extra_keys: Optional[list[str]] = None
                          ) -> DataFrame:
    """Watermarked event-time window counts (append-mode friendly:
    windows emit once the watermark passes their end; late rows beyond
    the watermark are dropped by Spark's state store)."""
    keys = [F.window(F.col(ts_col), window, slide or window)]
    keys += [F.col(k) for k in (extra_keys or [])]
    return (stream_df.withWatermark(ts_col, watermark)
            .groupBy(*keys)
            .agg(F.count("*").alias("n_events"))
            .select(F.col("window.start").alias("win_start"),
                    F.col("window.end").alias("win_end"),
                    *(extra_keys or []), "n_events"))


PROGRESS_STATE = T.StructType([
    T.StructField("n_turns", T.LongType()),
    T.StructField("first_us", T.LongType()),
    T.StructField("last_us", T.LongType()),
    T.StructField("n_user", T.LongType()),
    T.StructField("n_assistant", T.LongType()),
])

def _progress_output(key_name: str, key_type: T.DataType) -> T.StructType:
    # key column named and typed after the CALLER's group column —
    # a hardcoded (conv_id, string) field breaks non-string keys at
    # the Arrow boundary and silently renames the output column
    return T.StructType([
        T.StructField(key_name, key_type),
        T.StructField("n_turns", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n_user", T.LongType()),
        T.StructField("n_assistant", T.LongType()),
    ])


PROGRESS_OUTPUT = _progress_output("conv_id", T.StringType())


def conversation_progress(stream_df: DataFrame,
                          conv_col: str = "conv_id",
                          ts_col: str = "ts",
                          role_col: str = "role") -> DataFrame:
    """Custom stateful streaming operator: running per-conversation
    progress via ``applyInPandasWithState``. Each micro-batch updates
    the conversation's fixed-width state and emits the new running row
    (update semantics); numbers are exact regardless of how turns are
    split across micro-batches."""

    def update(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        n = nu = na = 0
        first = last = None
        if state.exists:
            n, first, last, nu, na = state.get
        for pdf in pdfs:
            n += len(pdf)
            ts = pdf[ts_col].dropna()  # NaT would cast to the int64
            # min sentinel and poison first_us for the key forever
            if len(ts):
                us = ts.astype("datetime64[us]").astype("int64")
                lo, hi = int(us.min()), int(us.max())
                first = lo if first is None else min(first, lo)
                last = hi if last is None else max(last, hi)
            roles = pdf[role_col].value_counts()
            nu += int(roles.get("user", 0))
            na += int(roles.get("assistant", 0))
        state.update((n, first, last, nu, na))
        yield pd.DataFrame({
            conv_col: [key[0]], "n_turns": [n], "first_us": [first],
            "last_us": [last], "n_user": [nu], "n_assistant": [na],
        })

    out_schema = _progress_output(
        conv_col, stream_df.schema[conv_col].dataType)
    return (stream_df.groupBy(conv_col)
            .applyInPandasWithState(update, out_schema,
                                    PROGRESS_STATE, "update",
                                    "NoTimeout"))
