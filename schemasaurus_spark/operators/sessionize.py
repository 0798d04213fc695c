"""Event sessionization — gaps-and-islands over a keyed event stream.

North-rule context: the validation engine's events table carries
``(event_id, ts, user_id, event_type, value)``; sessionization groups a
user's events into activity bursts separated by at least ``gap_seconds``
of silence.  This is the batch analog of Structured Streaming's
``session_window`` (streaming/window_stream.py gains the streaming
variant) — and the two are kept deliberately boundary-compatible so a
pytest can assert they produce identical sessions on the same input.

Semantics (matching ``F.session_window``'s merge rule):

* every event opens a window ``[ts, ts + gap]``;
* consecutive windows of one user MERGE iff ``next.ts <= prev.ts + gap``
  (verified empirically against ``F.session_window`` on Spark 4: two
  events EXACTLY ``gap`` apart land in ONE session), i.e. only a gap
  STRICTLY GREATER than ``gap_seconds`` starts a new session;
* gap arithmetic is exact to the microsecond on both the engine side
  (timestamp subtraction → DayTimeInterval compare; works for TIMESTAMP
  and TIMESTAMP_NTZ alike, no timezone involved) and the oracle side
  (``epoch_us`` integer difference) — no float seconds, no truncation
  mismatch at sub-second boundaries.

Scale shape (100 TB): ONE shuffle, on the user key, feeds both window
passes (lag + running sum share the same ``partitionBy/orderBy``, so
Catalyst plans a single Exchange + Sort and evaluates both in one
Window node where frames allow).  The per-session rollup that follows
keys on ``(user, session_seq)`` — a superset of the window key — so the
partial (map-side) aggregation collapses each user's events to its
session rows before the second, much thinner exchange.  Skew caveat: a
pathologically hot user serializes into one task's sort; the mitigation
at real scale is the same salting machinery used for uniqueness
(operators/uniqueness.py) applied to the rollup, while the windowed
assignment itself is inherently per-user-sequential.

No reference counterpart (brettz9/schemasaurus is schema-walk only);
this is north-rule/pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["assign_sessions", "session_stats"]


def _order_cols(ts_col: str, tiebreak_col: str | None) -> list[Column]:
    cols = [F.col(ts_col)]
    if tiebreak_col is not None:
        cols.append(F.col(tiebreak_col))
    return cols


def assign_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Tag every event with a per-user ``session_seq`` (1-based).

    A new session starts at the user's first event and at every event
    whose distance from its predecessor is ``> gap_seconds`` (exact
    microsecond integer compare — see module doc for why strict ``>``).
    ``tiebreak_col`` makes the sort total when timestamps collide; the
    session ASSIGNMENT is tie-order-invariant (equal timestamps have
    gap 0, which never opens a session), the tiebreak only pins the
    physical sort for determinism.
    """
    order = _order_cols(ts_col, tiebreak_col)
    w = Window.partitionBy(user_col).orderBy(*order)
    ts = F.col(ts_col)
    prev_ts = F.lag(ts).over(w)
    # timestamp difference is an exact microsecond DayTimeInterval for
    # both TIMESTAMP and TIMESTAMP_NTZ — no epoch cast, no timezone
    opens = (
        prev_ts.isNull()
        | ((ts - prev_ts) > F.expr(f"INTERVAL '{int(gap_seconds)}' SECOND"))
    ).cast("int")
    run = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn("session_seq", F.sum(opens).over(run))


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str | None = "value",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Per-session rollup: start/end, event count, optional value sum.

    ``session_end`` is the LAST EVENT's timestamp (not ``+ gap`` — the
    streaming ``session_window`` end is ``max(ts) + gap`` and converts
    by subtracting the gap; test_streaming asserts that equivalence).
    """
    # prune BEFORE the window pass: the user-keyed sort shuffles every
    # surviving column, so a wide events table must not ride along
    keep = [user_col, ts_col]
    if value_col is not None:
        keep.append(value_col)
    if tiebreak_col is not None:
        keep.append(tiebreak_col)
    tagged = assign_sessions(
        events.select(*keep),
        gap_seconds,
        user_col=user_col,
        ts_col=ts_col,
        tiebreak_col=tiebreak_col,
    )
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    return tagged.groupBy(F.col(user_col), F.col("session_seq")).agg(*aggs)


def session_paths(
    events: DataFrame,
    gap_seconds: int = 1800,
    top_k: int = 20,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = "event_id",
) -> DataFrame:
    """Top-``top_k`` session paths: the ordered event-type sequences
    users actually walk ("view>click>purchase"), ranked by how many
    sessions follow each — the path-mining summary funnels can't give
    (a funnel checks ONE hypothesized order; this surfaces the orders
    that exist).

    Output ``(rank, path, n_sessions)``; rank is 1-based with the
    deterministic total order (n_sessions desc, path asc).

    Construction: sessions from ``assign_sessions`` (one user-keyed
    window pass), then per (user, session) ONE aggregate builds the
    path in-array — ``collect_list(struct(ts_us, tiebreak, type))``,
    ``array_sort`` (struct lexicographic order = the session's total
    event order), ``transform`` + ``array_join`` — so event order
    never depends on shuffle arrival.  Top-k is orderBy+limit
    (TakeOrdered: per-partition heaps + a k-row driver merge, never a
    global sort of the path table).

    Scale caveat: a session's whole path materializes in one aggregate
    buffer — the sessionize.py hot-user caveat applies to pathological
    never-idle users; bound ``gap_seconds`` accordingly.
    """
    if top_k <= 0:
        raise ValueError(f"top_k must be positive, got {top_k}")
    tagged = assign_sessions(
        events.select(user_col, ts_col, type_col, *(
            [tiebreak_col] if tiebreak_col else []
        )),
        gap_seconds,
        user_col=user_col,
        ts_col=ts_col,
        tiebreak_col=tiebreak_col,
    )
    order_fields = [
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_o1"),
    ]
    if tiebreak_col:
        order_fields.append(F.col(tiebreak_col).alias("_o2"))
    order_fields.append(F.col(type_col).alias("_t"))
    per_session = tagged.groupBy(user_col, "session_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(*order_fields))),
                lambda s: s["_t"],
            ),
            ">",
        ).alias("path")
    )
    counts = per_session.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    top = counts.orderBy(F.desc("n_sessions"), F.asc("path")).limit(top_k)
    w = Window.orderBy(F.desc("n_sessions"), F.asc("path"))
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"), "path", "n_sessions"
    )
