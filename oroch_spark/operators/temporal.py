"""Temporal joins Spark lacks as built-ins: as-of join and
point-in-interval range join — the two lookups a transcript/event
pipeline needs to stitch state onto a timeline (which model config was
live at this turn's ts? which experiment window does this event fall
in?).

Both are expressed as compositions of existing DataFrame ops (no
Pandas UDF, no per-row Python), so Catalyst/Tungsten run them
whole-stage:

* ``asof_join`` uses the union + carry-forward trick: tag both sides,
  union, ONE hash shuffle on the key, sort each partition by
  (ts, side, tiebreak) and carry the latest right-side payload forward
  with ``last(..., ignorenulls=True)`` over an unbounded-preceding
  window. No join node at all — cost is a sort of |L|+|R| rows per
  key partition, vs the O(|L|·|R|) theta-join Spark would plan for
  ``l.ts >= r.ts``. This is the kdb/QuestDB ``aj`` / DuckDB
  ``ASOF JOIN`` operator.

* ``range_join`` buckets the value domain: each interval explodes to
  the buckets it covers (``sequence`` — JVM-side, no Python), probes
  map to one bucket, then an equi-join on (key, bucket) with exact
  containment as the residual — a BroadcastHashJoin/SortMergeJoin
  instead of the BroadcastNestedLoopJoin a raw ``lo <= x AND x <= hi``
  condition plans. Bucket width defaults to the average interval span
  (keeps per-interval fanout ~O(1)).

Scale notes (100 TB): the as-of union shuffles each row exactly once;
a hyperactive key pins one task for its own rows — cap per-key history
upstream or split by coarse time like ``sessions.sessionize``. The
range-join fanout is span/width per interval; degenerate full-domain
intervals should be routed to a broadcast side-channel (they match
everything) rather than exploded.

Determinism: ties on the right side at equal (key, ts) resolve by the
``tiebreak`` column (greatest wins) so a SQL oracle reproduces results
exactly.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: Optional[str] = None,
              right_cols: Optional[Sequence[str]] = None,
              tiebreak: Optional[str] = None,
              tolerance_seconds: Optional[float] = None,
              direction: str = "backward",
              matched_ts_col: Optional[str] = "asof_ts") -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` on the same key (``direction=
    'backward'``; ``'forward'`` takes the least >=). Unmatched left
    rows keep NULL right columns (left join semantics).

    ``right_cols``: right payload columns to attach (default: all
    non-key, non-ts). ``tolerance_seconds``: matches further than this
    from the left ts are nulled out. ``matched_ts_col``: name for the
    matched right timestamp column (None to drop it).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"bad direction {direction!r}")
    rts = right_ts or left_ts
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (on, rts)]
    else:
        right_cols = list(right_cols)
    missing = [c for c in right_cols if c not in right.columns]
    if missing:
        raise ValueError(f"right_cols not in right: {missing}")
    clash = [c for c in right_cols if c in left.columns]
    if clash:
        raise ValueError(
            f"right payload columns clash with left: {clash} — rename "
            "before joining (no silent suffixing)")

    ts = "__asof_ts"
    side = "__asof_side"
    mts = "__asof_mts"
    tb = "__asof_tb"
    left_cols = list(left.columns)

    lt = (left
          .withColumn(ts, F.col(left_ts))
          .withColumn(side, F.lit(1))
          .withColumn(mts, F.lit(None).cast(left.schema[left_ts].dataType))
          .withColumn(tb, F.lit(None).cast("long")))
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))

    rt = (right
          .withColumn(ts, F.col(rts))
          .withColumn(side, F.lit(0))
          .withColumn(mts, F.col(rts))
          .withColumn(tb, F.col(tiebreak).cast("long") if tiebreak
                      else F.lit(0)))
    for c in left_cols:
        if c == on:
            continue
        rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    ordered = [on] + [c for c in left_cols if c != on] \
        + right_cols + [ts, side, mts, tb]
    u = lt.select(*ordered).unionByName(rt.select(*ordered))

    # Backward: right rows sort BEFORE left rows at equal ts (side 0<1)
    # so a right row at exactly left_ts is visible to `last` — the <=
    # bound. `last(ignorenulls)` then carries the most recently seen
    # right payload: the greatest right ts <= left ts, greatest
    # tiebreak among equal ts (tb asc => greatest seen last). Forward
    # walks ts DESCENDING: every right row with ts >= left precedes it,
    # and the most recently seen is the LEAST such ts; side asc keeps
    # equal-ts right rows visible, tb asc keeps greatest-tiebreak-wins.
    ts_ord = F.col(ts).asc() if direction == "backward" \
        else F.col(ts).desc()
    w = (Window.partitionBy(on)
         .orderBy(ts_ord, F.col(side).asc(), F.col(tb).asc())
         .rowsBetween(Window.unboundedPreceding, 0))

    carried = {c: F.last(F.col(c), ignorenulls=True).over(w)
               for c in right_cols}
    carried_mts = F.last(F.col(mts), ignorenulls=True).over(w)

    out = u
    for c in right_cols:
        out = out.withColumn(c, carried[c])
    out = out.withColumn(mts, carried_mts)
    out = out.filter(F.col(side) == 1)

    if tolerance_seconds is not None:
        gap = F.abs(F.unix_micros(F.col(ts)) - F.unix_micros(F.col(mts)))
        ok = F.col(mts).isNotNull() & \
            (gap <= F.lit(int(tolerance_seconds * 1_000_000)))
        for c in right_cols:
            out = out.withColumn(
                c, F.when(ok, F.col(c)).otherwise(F.lit(None)))
        out = out.withColumn(
            mts, F.when(ok, F.col(mts)).otherwise(F.lit(None)))

    keep = left_cols + right_cols
    if matched_ts_col:
        out = out.withColumn(matched_ts_col, F.col(mts))
        keep = keep + [matched_ts_col]
    return out.select(*keep)


def range_join(probes: DataFrame, intervals: DataFrame,
               x_col: str, lo_col: str = "lo", hi_col: str = "hi",
               on: Optional[str] = None,
               bucket_width: Optional[float] = None,
               max_fanout: int = 4096) -> DataFrame:
    """Join each probe row to every interval row with
    ``lo <= x <= hi`` (inclusive; optionally also equal on ``on``),
    via bucketized equi-join.

    ``bucket_width`` defaults to the mean interval span (one planning
    aggregate over the intervals — bounded driver work). Intervals
    wider than ``max_fanout`` buckets raise: at that shape a broadcast
    theta-join is the honest plan and silent explosion would OOM.
    Output: all probe columns + all interval columns (names must not
    clash).
    """
    clash = set(probes.columns) & set(intervals.columns)
    clash -= {on} if on else set()
    if clash:
        raise ValueError(f"column clash: {sorted(clash)}")

    # One planning aggregate serves both the default width and the
    # fanout guard (eager — a lazy assert_true column would be pruned
    # by Catalyst the moment it is dropped from the projection).
    row = intervals.select(
        F.avg(F.col(hi_col) - F.col(lo_col)).alias("s"),
        F.max(F.col(hi_col) - F.col(lo_col)).alias("m")).first()
    if bucket_width is None:
        span = row["s"] if row and row["s"] is not None else None
        bucket_width = float(span) if span and span > 0 else 1.0
    bw = float(bucket_width)
    max_span = float(row["m"]) if row and row["m"] is not None else 0.0
    if max_span / bw + 1 > max_fanout:
        raise ValueError(
            f"range_join: widest interval spans ~{max_span / bw + 1:.0f}"
            f" buckets at width {bw} (> max_fanout={max_fanout}) — "
            "widen bucket_width or broadcast a theta-join for "
            "degenerate intervals")

    b = "__rj_bucket"
    pb = probes.withColumn(
        b, F.floor(F.col(x_col) / F.lit(bw)).cast("long"))
    iv = intervals.withColumn(b, F.explode(F.sequence(
        F.floor(F.col(lo_col) / F.lit(bw)).cast("long"),
        F.floor(F.col(hi_col) / F.lit(bw)).cast("long"))))

    keys = [b] + ([on] if on else [])
    out = pb.join(iv, on=keys, how="inner") \
        .filter((F.col(x_col) >= F.col(lo_col))
                & (F.col(x_col) <= F.col(hi_col)))
    return out.drop(b)
