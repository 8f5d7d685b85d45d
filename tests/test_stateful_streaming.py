"""Cross-batch stateful streaming checks (applyInPandasWithState) and
watermarked windowed drift: state must survive across micro-batches AND
across separate AvailableNow runs via the checkpoint's state store."""

from __future__ import annotations

from datetime import datetime, timedelta

from hjsonschema_spark.operators.drift import chi_squared_drift
from hjsonschema_spark.streaming import (
    run_ordered_state,
    score_drift_windows,
    windowed_histogram_stream,
)

DDL = "conv_id string, turn_idx long, ts timestamp"
VIOL_DDL = "conv_id string, turn_idx long, check string, value string"
T0 = datetime(2026, 1, 1, 0, 0, 0)


def _write(spark, rows, path):
    spark.createDataFrame(rows, DDL).coalesce(1).write.mode("append").parquet(path)


def _mins(m):
    return T0 + timedelta(minutes=m)


def test_ordered_state_cross_batch(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: two clean conversations
    batch1 = [("A", i, _mins(i)) for i in range(5)] + [
        ("B", i, _mins(i)) for i in range(3)
    ]
    _write(spark, batch1, inp)
    stream = spark.readStream.schema(DDL).parquet(inp)
    run_ordered_state(stream, out, ckpt)
    assert spark.read.schema(VIOL_DDL).parquet(out).count() == 0

    # run 2: violations that are ONLY visible with cross-run state
    batch2 = (
        # A: duplicate of run-1 turn 3; 5..9 contiguous but turn 8's ts
        # regresses below turn 7's
        [("A", 3, _mins(3))]
        + [("A", i, _mins(i)) for i in (5, 6, 7)]
        + [("A", 8, _mins(0)), ("A", 9, _mins(9))]
        # B: gap — run 1 ended at turn 2, turn 3 never arrives
        + [("B", i, _mins(i)) for i in (4, 5)]
        # C: brand-new conversation starting at 1, not 0
        + [("C", 1, _mins(1))]
    )
    _write(spark, batch2, inp)
    stream = spark.readStream.schema(DDL).parquet(inp)
    run_ordered_state(stream, out, ckpt)

    got = {
        (r["conv_id"], r["turn_idx"], r["check"])
        for r in spark.read.schema(VIOL_DDL).parquet(out).collect()
    }
    assert got == {
        ("A", 3, "stream_unique:conv_id,turn_idx"),
        ("A", 8, "stream_monotonic:ts"),
        ("B", 4, "stream_contiguous:turn_idx"),
        ("C", 1, "stream_contiguous:turn_idx"),
    }

    # run 3: another redelivery of a run-1 turn — state still remembers
    _write(spark, [("A", 0, _mins(0))], inp)
    stream = spark.readStream.schema(DDL).parquet(inp)
    run_ordered_state(stream, out, ckpt)
    v3 = spark.read.schema(VIOL_DDL).parquet(out)
    assert v3.filter("conv_id = 'A' AND turn_idx = 0").count() == 1
    assert v3.count() == 5


def test_event_time_ttl_evicts_idle_state(spark, tmp_path):
    """Event-time TTL: a conversation idle past the TTL (in event time)
    is evicted once the watermark passes its deadline; a late turn then
    RESTARTS the conversation (contiguity restart), and is NOT a
    duplicate even though the same turn_idx was seen before eviction.
    Must terminate under AvailableNow (watermark-keyed timers)."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        run_ordered_state(
            spark.readStream.schema(DDL).parquet(inp),
            out, ckpt,
            event_ttl_minutes=30, watermark_delay="10 minutes",
        )

    # run 1: conversation A, clean turns 0..2 around T0
    _write(spark, [("A", i, _mins(i)) for i in range(3)], inp)
    run()
    assert spark.read.schema(VIOL_DDL).parquet(out).count() == 0

    # run 2: a late-clock conversation W two hours on — pushes the
    # watermark to ~T0+110min, far past A's deadline (T0+2min+30min),
    # so A's timer fires in the trailing no-data batch and A is evicted
    _write(spark, [("W", 0, _mins(120)), ("W", 1, _mins(121))], inp)
    run()

    # run 3: A redelivers turn 1 — with state evicted this must NOT be
    # a duplicate; it restarts A, expected index 0
    _write(spark, [("A", 1, _mins(122))], inp)
    run()
    got = {
        (r["conv_id"], r["turn_idx"], r["check"], r["value"])
        for r in spark.read.schema(VIOL_DDL).parquet(out).collect()
    }
    assert got == {("A", 1, "stream_contiguous:turn_idx", "expected=0")}


def test_windowed_drift(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # window 1 [00:00, 05:00): a×8 b×2 — drifted vs 50/50
    # window 2 [05:00, 10:00): a×5 b×5 — matches the reference
    rows = (
        [("a", i, _mins(0)) for i in range(8)]
        + [("b", i, _mins(1)) for i in range(2)]
        + [("a", i, _mins(5)) for i in range(5)]
        + [("b", i, _mins(6)) for i in range(5)]
        # sentinel an hour later: pushes the watermark past both real
        # windows so append mode finalizes them; its own window stays
        # open and must NOT be emitted
        + [("z", 0, _mins(60))]
    )
    spark.createDataFrame(rows, "role string, i long, ts timestamp").coalesce(
        1
    ).write.parquet(inp)

    stream = spark.readStream.schema("role string, i long, ts timestamp").parquet(inp)
    hist = windowed_histogram_stream(
        stream, "role", window="5 minutes", watermark="1 minutes"
    )
    q = (
        hist.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination()

    emitted = spark.read.schema(
        "win_start timestamp, win_end timestamp, category string, n long"
    ).parquet(out)
    counts = {
        (r["win_start"], r["category"]): r["n"] for r in emitted.collect()
    }
    assert counts == {
        (_mins(0), "a"): 8,
        (_mins(0), "b"): 2,
        (_mins(5), "a"): 5,
        (_mins(5), "b"): 5,
    }

    scored = score_drift_windows(emitted, {"a": 5, "b": 5}).collect()
    assert [r["win_start"] for r in scored] == [_mins(0), _mins(5)]
    w1, w2 = scored
    # (8-5)²/5 + (2-5)²/5 = 3.6 — and must equal the batch operator
    batch_stat = chi_squared_drift(
        spark.createDataFrame([("a",)] * 8 + [("b",)] * 2, "role string"),
        "role",
        {"a": 5, "b": 5},
    )["statistic"]
    assert abs(w1["chi2"] - 3.6) < 1e-9 and abs(w1["chi2"] - batch_stat) < 1e-9
    assert w1["dof"] == 1 and w1["n_rows"] == 10
    assert abs(w2["chi2"]) < 1e-9 and w2["n_rows"] == 10


def test_session_window_agrees_with_batch_sessionize(spark, tmp_path):
    from hjsonschema_spark.operators.pipeline import sessionize
    from hjsonschema_spark.streaming import session_window_stream

    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    rows = (
        # conv A: two sessions split by a 31-min gap
        [("A", i, _mins(m)) for i, m in enumerate((0, 10, 20, 51, 52))]
        # conv B: one session — 29-min gap is under the 30-min gap in
        # both impls (NOTE the boundary differs: batch sessionize merges
        # an exactly-30-min gap (strict >), session_window's half-open
        # [ts, ts+gap) does not — avoid exact-gap data when comparing)
        + [("B", 0, _mins(0)), ("B", 1, _mins(29))]
        # sentinel pushes the watermark past every real session
        + [("Z", 0, _mins(24 * 60))]
    )
    spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(inp)

    stream = spark.readStream.schema(DDL).parquet(inp)
    q = (
        session_window_stream(stream, key_col="conv_id", gap="30 minutes", watermark="1 minutes")
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", out)
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r["conv_id"], r["session_start"]): r["n_events"]
        for r in spark.read.schema(
            "conv_id string, session_start timestamp, session_end_plus_gap timestamp, n_events long"
        ).parquet(out).collect()
    }
    batch = {
        (r["conv_id"], r["session_start"]): r["n_events"]
        for r in sessionize(
            spark.createDataFrame(rows, DDL).filter("conv_id <> 'Z'"),
            key_col="conv_id", ts_col="ts", gap_minutes=30,
        ).collect()
    }
    assert streamed == batch == {
        ("A", _mins(0)): 3,
        ("A", _mins(51)): 2,
        ("B", _mins(0)): 2,
    }


def test_stream_turn_budget_across_runs(spark, tmp_path):
    """max_turns counts accepted turns ACROSS AvailableNow runs:
    a conversation under budget in run 1 crosses it in run 2;
    duplicates do not consume budget."""
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # run 1: A has 4 turns (budget 6), B has 2
    _write(spark, [("A", i, _mins(i)) for i in range(4)]
           + [("B", i, _mins(i)) for i in range(2)], inp)
    stream = spark.readStream.schema(DDL).parquet(inp)
    run_ordered_state(stream, out, ckpt, max_turns=6)
    assert (
        spark.read.schema(VIOL_DDL).parquet(out)
        .filter("check = 'stream_group_bounds:n_turns'").count() == 0
    )

    # run 2: A gets 4 more (turns 4..7 => counts 5..8, two over budget)
    # plus a duplicate of turn 0 (doesn't count); B stays under
    _write(spark, [("A", i, _mins(i)) for i in (4, 5, 6, 7)]
           + [("A", 0, _mins(0))] + [("B", 2, _mins(2))], inp)
    stream = spark.readStream.schema(DDL).parquet(inp)
    run_ordered_state(stream, out, ckpt, max_turns=6)

    viol = (
        spark.read.schema(VIOL_DDL).parquet(out)
        .filter("check = 'stream_group_bounds:n_turns'").collect()
    )
    got = {(r["conv_id"], r["turn_idx"]): r["value"] for r in viol}
    assert got == {("A", 6): "n=7>max=6", ("A", 7): "n=8>max=6"}
