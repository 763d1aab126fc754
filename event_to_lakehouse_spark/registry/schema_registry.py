"""Schema registry: per-topic JSON schema inference with content-hashed
versioning and incremental state (SURVEY §7.2 step 4).

Re-expresses ``scripts/schema_inferer.py`` semantics Spark-first:

- inference: ``spark.read.json`` over the newest-N sample files with
  ``samplingRatio``, PERMISSIVE + corrupt-record capture, corrupt
  column dropped before emitting (:154-176).
- wire format: Spark's own ``df.schema.json()`` (:176) — what
  ``StructType.fromJson`` round-trips.
- change detection: SHA-256 of the schema JSON; a new version is
  written only when the hash changes (:107-108, :229-234).
- incremental gate: mtime high-watermark per topic — skip topics whose
  newest file was already processed (:198-216).
- failure isolation: per-topic try/except; failures recorded in state,
  loop continues (:257-271).

Storage here is a local/posix directory layout (<registry>/<topic>/
schema/v<N>.json + _state.json). On an object store, swap `_Store` for
one that writes each blob as a folder of one file — the reference's
S3A-rename-safe pattern (:129-148) — the registry logic is unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass, field

from pyspark.sql import SparkSession

from ..pipeline.normalize import CORRUPT_COL, JSON_OPTIONS

DEFAULT_MAX_FILES = 50  # newest-N cap (reference :25)
DEFAULT_SAMPLING_RATIO = 0.2  # (reference :26)


@dataclass
class TopicState:
    """Per-topic registry state (fields mirror docs/schema_inferer.md:58-67)."""

    topic: str
    last_processed_mtime: float = 0.0
    schema_hash: str | None = None
    schema_version: int = 0
    schema_changed: bool = False
    last_run_utc: str | None = None
    sample_file_count: int = 0
    failure_reason: str | None = None


def schema_fingerprint(schema_json: str) -> str:
    """SHA-256 content hash of the schema wire format (:107-108)."""
    return hashlib.sha256(schema_json.encode("utf-8")).hexdigest()


class SchemaRegistry:
    def __init__(self, spark: SparkSession, registry_dir: str):
        self.spark = spark
        self.dir = registry_dir

    # -- state blobs -------------------------------------------------------
    def _state_path(self, topic: str) -> str:
        return os.path.join(self.dir, topic, "_state.json")

    def read_state(self, topic: str) -> TopicState:
        """Tolerant state read: unparseable/missing state resets the
        watermark rather than failing the run (:111-126)."""
        try:
            with open(self._state_path(topic)) as f:
                return TopicState(**json.load(f))
        except Exception:
            return TopicState(topic=topic)

    def write_state(self, state: TopicState) -> None:
        os.makedirs(os.path.dirname(self._state_path(state.topic)), exist_ok=True)
        with open(self._state_path(state.topic), "w") as f:
            json.dump(asdict(state), f, sort_keys=True, indent=2)

    def _schema_dir(self, topic: str) -> str:
        return os.path.join(self.dir, topic, "schema")

    def write_schema(self, topic: str, version: int, schema_json: str) -> str:
        d = self._schema_dir(topic)
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"v{version}.json")
        with open(p, "w") as f:
            f.write(schema_json)
        return p

    def latest_schema(self, topic: str) -> str | None:
        d = self._schema_dir(topic)
        if not os.path.isdir(d):
            return None
        versions = sorted(
            int(f[1:-5]) for f in os.listdir(d) if f.startswith("v") and f.endswith(".json")
        )
        if not versions:
            return None
        with open(os.path.join(d, f"v{versions[-1]}.json")) as f:
            return f.read()

    # -- inference ---------------------------------------------------------
    @staticmethod
    def _list_files(topic_dir: str) -> list[tuple[str, float]]:
        """Recursive (path, mtime) listing; hidden files (`_`/`.` prefix)
        excluded — Spark's own convention (:59-60)."""
        out = []
        for root, _dirs, files in os.walk(topic_dir):
            for name in files:
                if name.startswith(("_", ".")):
                    continue
                p = os.path.join(root, name)
                out.append((p, os.path.getmtime(p)))
        return out

    def infer_schema(
        self,
        sample_files: list[str],
        sampling_ratio: float | None = DEFAULT_SAMPLING_RATIO,
    ) -> str:
        """One Spark job: sampled JSON schema inference; corrupt column
        dropped from the emitted schema (:154-176)."""
        # multiLine: bronze layout is one JSON document per file (:33 of
        # normalize; the batch JSON reader needs the flag explicitly).
        opts = {"multiLine": "true", **JSON_OPTIONS}
        if sampling_ratio is not None:
            opts["samplingRatio"] = str(sampling_ratio)
        df = self.spark.read.options(**opts).json(sample_files)
        if CORRUPT_COL in df.columns:
            df = df.drop(CORRUPT_COL)
        return df.schema.json()

    def run_topic(
        self,
        topic: str,
        topic_dir: str,
        max_files: int = DEFAULT_MAX_FILES,
        sampling_ratio: float | None = DEFAULT_SAMPLING_RATIO,
    ) -> TopicState:
        """Process one topic: mtime gate → newest-N sample → infer →
        hash-compare → conditional version write → state write."""
        state = self.read_state(topic)
        state.schema_changed = False
        state.failure_reason = None
        try:
            files = self._list_files(topic_dir)
            if not files:
                raise FileNotFoundError(f"no data files under {topic_dir}")
            newest_mtime = max(m for _, m in files)
            if newest_mtime <= state.last_processed_mtime:
                return state  # incremental skip (:205-210)

            sample = [p for p, _ in sorted(files, key=lambda x: -x[1])[:max_files]]
            schema_json = self.infer_schema(sample, sampling_ratio)
            new_hash = schema_fingerprint(schema_json)
            if new_hash != state.schema_hash:
                state.schema_version += 1
                state.schema_changed = True
                self.write_schema(topic, state.schema_version, schema_json)
                state.schema_hash = new_hash
            state.last_processed_mtime = newest_mtime
            state.sample_file_count = len(sample)
        except Exception as e:  # failure isolation (:257-271)
            state.failure_reason = f"{type(e).__name__}: {e}"
        state.last_run_utc = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
        self.write_state(state)
        return state

    def run_once(self, bronze_root: str, **kwargs) -> dict[str, TopicState]:
        """Discover topics (immediate subdirs of bronze root, :187) and
        process each with failure isolation."""
        results = {}
        if os.path.isdir(bronze_root):
            for topic in sorted(os.listdir(bronze_root)):
                tdir = os.path.join(bronze_root, topic)
                if os.path.isdir(tdir) and not topic.startswith(("_", ".")):
                    results[topic] = self.run_topic(topic, tdir, **kwargs)
        return results
