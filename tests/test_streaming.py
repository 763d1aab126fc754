"""Streaming semantics: watermarked windows, session windows, streaming
dedup — availableNow over JSON file sources (SURVEY §2.9 fills)."""

from __future__ import annotations

import json
import uuid
from pathlib import Path

from event_to_lakehouse_spark.streaming.jobs import (
    dedup_within_watermark,
    read_event_stream,
    session_windows,
    windowed_counts,
)


def _write_events(dir_: str, events: list[dict]) -> str:
    p = Path(dir_)
    p.mkdir(parents=True, exist_ok=True)
    for i, batch in enumerate([events]):
        (p / f"part_{i}.json").write_text(
            "\n".join(json.dumps(e) for e in batch)
        )
    return str(p)


EVENTS = [
    {"event_id": 1, "ts": "2024-01-01T10:05:00", "user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"},
    {"event_id": 2, "ts": "2024-01-01T10:20:00", "user_id": 1, "event_type": "click", "value": 2.0, "props": "{}"},
    {"event_id": 3, "ts": "2024-01-01T11:05:00", "user_id": 1, "event_type": "view", "value": 3.0, "props": "{}"},
    {"event_id": 4, "ts": "2024-01-01T12:40:00", "user_id": 2, "event_type": "click", "value": 4.0, "props": "{}"},
    # duplicate of event 2 (late re-delivery)
    {"event_id": 2, "ts": "2024-01-01T10:20:00", "user_id": 1, "event_type": "click", "value": 2.0, "props": "{}"},
]


def _mem_query(df, name: str, mode: str):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def test_windowed_counts(spark, tmp_dir):
    src = _write_events(f"{tmp_dir}/events", EVENTS)
    stream = read_event_stream(spark, src)
    name = f"win_{uuid.uuid4().hex[:8]}"
    q = _mem_query(windowed_counts(stream, "1 hour"), name, "complete")
    q.awaitTermination(120)
    rows = {
        (str(r.window_start), r.event_type): r.n_events
        for r in spark.sql(f"select * from {name}").collect()
    }
    assert rows[("2024-01-01 10:00:00", "click")] == 3  # incl. duplicate
    assert rows[("2024-01-01 11:00:00", "view")] == 1
    assert rows[("2024-01-01 12:00:00", "click")] == 1


def test_session_windows(spark, tmp_dir):
    src = _write_events(f"{tmp_dir}/events", EVENTS)
    stream = read_event_stream(spark, src)
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = _mem_query(session_windows(stream, gap="30 minutes"), name, "complete")
    q.awaitTermination(120)
    rows = spark.sql(f"select * from {name}").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    # user 1: events at 10:05/10:20 merge (gap 15m), 11:05 starts a new session
    assert len(by_user[1]) == 2
    assert len(by_user[2]) == 1


def test_dedup_within_watermark(spark, tmp_dir):
    src = _write_events(f"{tmp_dir}/events", EVENTS)
    stream = read_event_stream(spark, src)
    name = f"dedup_{uuid.uuid4().hex[:8]}"
    q = _mem_query(dedup_within_watermark(stream, ["event_id"]), name, "append")
    q.awaitTermination(120)
    rows = spark.sql(f"select * from {name}").collect()
    ids = [r.event_id for r in rows]
    assert sorted(ids) == [1, 2, 3, 4]  # duplicate event_id=2 dropped


def test_idempotent_foreach_batch_replay(spark, tmp_dir):
    """Replaying the same micro-batch id must not double-append — the
    fix for the reference's blind-append gap (SURVEY §7.4)."""
    from event_to_lakehouse_spark.pipeline.normalize import foreach_batch_writer

    df = spark.createDataFrame(
        [("a", "rapid7"), ("b", "rapid7")], ["asset_uid", "source_system"]
    )
    writer = foreach_batch_writer(f"{tmp_dir}/out", idempotent=True)
    writer(df, 7)
    writer(df, 7)  # replay
    back = spark.read.parquet(f"{tmp_dir}/out")
    assert back.count() == 2
