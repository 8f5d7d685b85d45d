"""Cross-batch stateful streaming checks.

``checks/checkpoint.py`` and ``streaming/incremental.py`` run the full
suite per micro-batch, but explicitly document one limitation: checks
that need CROSS-batch context (a duplicate (conv_id, turn_idx) arriving
in a later batch, a turn-index gap that spans a batch boundary, a
timestamp regression relative to a turn seen yesterday) cannot be
expressed in ``foreachBatch``. This module closes that gap with
``applyInPandasWithState``: the ordered-check trio the batch engine
fuses into one window pass (UniqueKey + Contiguous + Monotonic,
compile.py fused ordered pass) re-expressed as a keyed streaming
operator with O(1) state per conversation.

Reference semantics (behavioral spec only): uniqueItems
(/root/reference/src/JSONSchema/Validator/Draft4/Array.hs:73-77) lifted
to table scope, as in checks/ir.py UniqueKey/Contiguous/Monotonic —
here additionally lifted across TIME.

Scale design (10^12 turns):
- State per conversation is three scalars (max turn_idx, last ts,
  turn count) — no growing seen-sets. 10^9 live conversations ≈ tens
  of GB across the cluster, inside the RocksDB state store's budget.
- The only shuffle is the hash exchange on conv_id that any keyed
  stateful operator needs; rows arrive in Arrow batches per group.
- For CONTINUOUS deployments (ProcessingTime trigger), idle
  conversations can be evicted via processing-time timeout
  (``state_ttl_minutes``) — unbounded retention would leak state
  forever on a forever stream. Eviction only forgets idle
  conversations; a turn arriving after eviction restarts its
  conversation state (documented bounded-state trade-off).
  TTL is OPT-IN and must not be combined with Trigger.AvailableNow:
  with ProcessingTimeTimeout the stateful operator's
  shouldRunAnotherBatch is true whenever the batch clock advances,
  so an AvailableNow run schedules no-data micro-batches forever to
  fire timers and never terminates (observed: 288+ empty batches).
  The default (``state_ttl_minutes=None``) uses NoTimeout, which
  terminates AvailableNow catch-up runs once the data is drained.
- For bounded state that ALSO terminates under AvailableNow, use
  EVENT-time TTL (``event_ttl_minutes`` + a watermark): timers are
  keyed to the watermark, which stops advancing when the data stops,
  so the trailing no-data batch fires due timers and the run ends.
  Eviction is then deterministic in the data (not the wall clock):
  a conversation idle for more than the TTL in EVENT time is
  forgotten, and a late turn after eviction restarts at state zero
  (flagged as a contiguity restart, not a duplicate).
- For production, enable the RocksDB state store provider
  (spark.sql.streaming.stateStore.providerClass) so state spills to
  local disk instead of executor heap.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

VIOLATION_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", LongType()),
        StructField("check", StringType()),
        StructField("value", StringType()),
    ]
)

# max turn_idx seen, last ts (epoch micros), number of turns seen
STATE_SCHEMA = StructType(
    [
        StructField("max_idx", LongType()),
        StructField("last_ts", LongType()),
        StructField("n_turns", LongType()),
    ]
)

_COLS = [f.name for f in VIOLATION_SCHEMA.fields]


def _ordered_state_fn(
    state_ttl_ms: int | None,
    event_ttl_ms: int | None = None,
    max_turns: int | None = None,
):
    """Build the applyInPandasWithState function. TTL closure:
    state_ttl_ms = processing-time TTL, event_ttl_ms = event-time TTL
    (timeout timestamp = last event ts + TTL, clamped above the
    watermark as Spark requires), both None = NoTimeout. max_turns:
    cross-batch conversation turn budget (GroupAggBounds' streaming
    analogue) — every accepted turn beyond the budget emits a
    ``stream_group_bounds`` violation (duplicates don't count)."""

    def fn(key: Tuple, pdfs: Iterable[pd.DataFrame], state) -> Iterable[pd.DataFrame]:
        conv_id = key[0]
        if (state_ttl_ms is not None or event_ttl_ms is not None) and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            max_idx, last_ts, n_turns = state.get
        else:
            max_idx, last_ts, n_turns = -1, -(2**62), 0

        out: list[dict] = []
        for pdf in pdfs:
            pdf = pdf.sort_values("turn_idx", kind="stable")
            idx = pdf["turn_idx"].to_numpy()
            # pandas datetime64 → epoch micros; NaT (NULL ts) → None so
            # the monotonic check is vacuous for that row (engine NULL
            # rule) without exempting it from unique/contiguous
            null_ts = pd.isna(pdf["ts"]).to_numpy()
            ts = pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            for cur, cur_ts, ts_is_null in zip(idx.tolist(), ts.tolist(), null_ts.tolist()):
                if cur <= max_idx:
                    out.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": cur,
                            "check": "stream_unique:conv_id,turn_idx",
                            "value": f"seen_max={max_idx}",
                        }
                    )
                    # a duplicate advances neither max_idx nor the clock
                    continue
                if cur != max_idx + 1:
                    out.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": cur,
                            "check": "stream_contiguous:turn_idx",
                            "value": f"expected={max_idx + 1}",
                        }
                    )
                if not ts_is_null and cur_ts < last_ts:
                    out.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": cur,
                            "check": "stream_monotonic:ts",
                            "value": f"last_ts={last_ts}",
                        }
                    )
                max_idx = cur
                if not ts_is_null:
                    last_ts = max(last_ts, cur_ts)
                n_turns += 1
                if max_turns is not None and n_turns > max_turns:
                    out.append(
                        {
                            "conv_id": conv_id,
                            "turn_idx": cur,
                            "check": "stream_group_bounds:n_turns",
                            "value": f"n={n_turns}>max={max_turns}",
                        }
                    )

        state.update((max_idx, last_ts, n_turns))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        elif event_ttl_ms is not None:
            # last_ts is epoch MICROS (or the -2^62 sentinel when every
            # ts so far was NULL); timers take epoch millis and must sit
            # strictly above the current watermark
            due = last_ts // 1000 + event_ttl_ms
            state.setTimeoutTimestamp(max(due, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(out, columns=_COLS)

    return fn


def ordered_state_stream(
    stream: DataFrame,
    state_ttl_minutes: int | None = None,
    event_ttl_minutes: int | None = None,
    watermark_delay: str = "10 minutes",
    max_turns: int | None = None,
) -> DataFrame:
    """Cross-batch ordered checks over a transcript stream.

    Input: a STREAMING DataFrame with at least (conv_id string,
    turn_idx int/long, ts timestamp). Output: a streaming DataFrame of
    violation rows (conv_id, turn_idx, check, value), append mode —
    the streaming analogue of the batch engine's fused ordered pass:

    - ``stream_unique`` — a (conv_id, turn_idx) at or below the
      conversation's high-water mark, i.e. a duplicate/redelivery,
      even when the original arrived in an earlier micro-batch or an
      earlier RUN (state lives in the checkpoint's state store).
    - ``stream_contiguous`` — turn_idx skips the expected next index
      (gaps spanning batch boundaries included; a conversation's
      first turn is expected at index 0).
    - ``stream_monotonic`` — ts earlier than the conversation's
      latest ts seen so far.
    - ``stream_group_bounds`` (opt-in via ``max_turns``) — the
      conversation's accepted-turn count crossed the budget, counted
      ACROSS batches and runs (duplicates don't count); the streaming
      analogue of GroupAggBounds(agg="count").

    AvailableNow catch-up runs compose: run 1 processes a
    conversation's first half, run 2 its second, and a duplicate in
    run 2 of a run-1 turn is still caught.

    TTL modes (mutually exclusive):
    - both None (default): NoTimeout — state never evicted; safe for
      Trigger.AvailableNow runs.
    - ``state_ttl_minutes``: processing-time TTL — ONLY under a
      ProcessingTime trigger (see module docstring: processing-time
      timers make AvailableNow loop no-data batches forever).
    - ``event_ttl_minutes``: event-time TTL — adds a watermark of
      ``watermark_delay`` on ts; conversations idle past the TTL in
      event time are evicted. Works under AvailableNow (timers stop
      firing when the watermark stops advancing).
    """
    if state_ttl_minutes is not None and event_ttl_minutes is not None:
        raise ValueError("choose one of state_ttl_minutes / event_ttl_minutes")
    prepared = stream.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("long"),
        F.col("ts").cast("timestamp"),
    ).filter(F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull())
    if state_ttl_minutes is not None:
        mode = "ProcessingTimeTimeout"
        fn = _ordered_state_fn(state_ttl_minutes * 60_000, max_turns=max_turns)
    elif event_ttl_minutes is not None:
        mode = "EventTimeTimeout"
        fn = _ordered_state_fn(None, event_ttl_minutes * 60_000, max_turns=max_turns)
        prepared = prepared.withWatermark("ts", watermark_delay)
    else:
        mode, fn = "NoTimeout", _ordered_state_fn(None, max_turns=max_turns)
    return prepared.groupBy("conv_id").applyInPandasWithState(
        fn, VIOLATION_SCHEMA, STATE_SCHEMA, "append", mode
    )


def run_ordered_state(
    stream: DataFrame,
    out_path: str,
    checkpoint_dir: str,
    state_ttl_minutes: int | None = None,
    event_ttl_minutes: int | None = None,
    watermark_delay: str = "10 minutes",
    max_turns: int | None = None,
):
    """Run ordered_state_stream to AvailableNow completion, appending
    violations to ``out_path``. Returns the finished StreamingQuery.
    Processing-time TTL is rejected here (AvailableNow + processing-time
    timers never terminate — module docstring); event-time TTL is fine."""
    if state_ttl_minutes is not None:
        raise ValueError(
            "state_ttl_minutes is incompatible with AvailableNow: "
            "processing-time timers force endless no-data micro-batches; "
            "use event_ttl_minutes instead"
        )
    q = (
        ordered_state_stream(
            stream,
            event_ttl_minutes=event_ttl_minutes,
            watermark_delay=watermark_delay,
            max_turns=max_turns,
        )
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out_path)
        .start()
    )
    q.awaitTermination()
    return q


# ---------------------------------------------------------------------------
# Watermarked windowed drift
# ---------------------------------------------------------------------------

def windowed_histogram_stream(
    stream: DataFrame,
    col: str,
    ts_col: str = "ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time-windowed category histogram with a watermark.

    Pure built-in streaming aggregation (watermark + tumbling window +
    count): partial aggregation map-side, one shuffle on (window,
    category), state bounded by the watermark — late rows beyond it
    are dropped, finalized windows are emitted once (append mode) and
    their state evicted. The streaming face of drift.histogram().
    """
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), F.col(col).alias("category"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "category",
            "n",
        )
    )


def score_drift_windows(windows_df: DataFrame, reference: dict[str, int]) -> DataFrame:
    """Chi-squared drift score per emitted window against a reference
    histogram (batch side, run over the windowed sink table).

    Same math as operators/drift.chi_squared_drift (expected counts =
    reference fractions × the window's total): build the full
    (window × reference-category) grid by cross-joining the per-window
    totals with the broadcast reference dim, left-join the observed
    counts, fill 0 — so a category absent from a window contributes
    its full expected mass ((0-E)²/E); categories absent from the
    REFERENCE are ignored, as in chi_squared_drift. Returns
    (win_start, win_end, n_rows, chi2, dof) ordered by window start.
    """
    ref_total = sum(reference.values())
    ref_items = [(k, float(v) / ref_total) for k, v in sorted(reference.items())]
    ref_df = windows_df.sparkSession.createDataFrame(
        ref_items, "category string, ref_frac double"
    )
    totals = windows_df.groupBy("win_start", "win_end").agg(F.sum("n").alias("n_rows"))
    with_exp = (
        totals.crossJoin(F.broadcast(ref_df))
        .join(windows_df, ["win_start", "win_end", "category"], "left")
        .withColumn("expected", F.col("ref_frac") * F.col("n_rows"))
        .withColumn(
            "term",
            F.pow(F.coalesce(F.col("n"), F.lit(0)) - F.col("expected"), 2)
            / F.col("expected"),
        )
    )
    return (
        with_exp.groupBy("win_start", "win_end", "n_rows")
        .agg(
            F.sum("term").alias("chi2"),
            (F.count(F.lit(1)) - F.lit(1)).cast("long").alias("dof"),
        )
        .orderBy("win_start")
    )


def session_window_stream(
    stream: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming sessionization via the native ``session_window``
    (dynamic-gap windows merged by the state store, evicted at the
    watermark) — the streaming complement of ``pipeline.sessionize``.

    Near-identical session boundaries to the batch op, with two
    documented convention differences: (1) ``session_window``'s window
    end is last_event_ts + gap, whereas batch ``sessionize`` reports
    session_end = max(ts); (2) an EXACTLY-gap-apart pair does not merge
    here (half-open [ts, ts+gap)) but does merge in ``sessionize``
    (strict ``>`` on the gap). Membership otherwise agrees — pinned by
    tests/test_stateful_streaming.py.
    """
    return (
        stream.filter(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end_plus_gap"),
            "n_events",
        )
    )
