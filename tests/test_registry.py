"""Schema-registry semantics (reference scripts/schema_inferer.py):
inference, hash-versioning, mtime gate, failure isolation."""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

from pyspark.sql import types as T

from event_to_lakehouse_spark.registry.schema_registry import SchemaRegistry
from tests.conftest import RAPID7_RECORDS, write_bronze


def test_infer_and_version(spark, tmp_dir):
    topic_dir = write_bronze(f"{tmp_dir}/bronze/topic_a", RAPID7_RECORDS)
    reg = SchemaRegistry(spark, f"{tmp_dir}/registry")

    st = reg.run_topic("topic_a", topic_dir)
    assert st.failure_reason is None
    assert st.schema_changed and st.schema_version == 1
    schema_json = reg.latest_schema("topic_a")
    schema = T.StructType.fromJson(json.loads(schema_json))  # round-trips
    assert "hostName" in schema.fieldNames()
    assert "_corrupt_record" not in schema.fieldNames()  # dropped (:160-163)


def test_mtime_gate_skips_unchanged(spark, tmp_dir):
    topic_dir = write_bronze(f"{tmp_dir}/bronze/topic_b", RAPID7_RECORDS)
    reg = SchemaRegistry(spark, f"{tmp_dir}/registry")
    st1 = reg.run_topic("topic_b", topic_dir)
    st2 = reg.run_topic("topic_b", topic_dir)  # nothing new → skip
    assert st1.schema_version == 1
    assert st2.schema_version == 1 and not st2.schema_changed


def test_schema_change_bumps_version_only_on_hash_change(spark, tmp_dir):
    topic_dir = write_bronze(f"{tmp_dir}/bronze/topic_c", RAPID7_RECORDS, corrupt=False)
    reg = SchemaRegistry(spark, f"{tmp_dir}/registry")
    assert reg.run_topic("topic_c", topic_dir).schema_version == 1

    # same shape, new file → mtime advances but hash is unchanged
    time.sleep(0.01)
    extra = dict(RAPID7_RECORDS[0], id=103)
    Path(topic_dir, "rec_new.json").write_text(json.dumps(extra, indent=2))
    os.utime(Path(topic_dir, "rec_new.json"))
    st = reg.run_topic("topic_c", topic_dir)
    assert st.schema_version == 1 and not st.schema_changed

    # genuinely new field → new version
    time.sleep(0.01)
    widened = dict(extra, brand_new_field="x")
    Path(topic_dir, "rec_widened.json").write_text(json.dumps(widened, indent=2))
    st = reg.run_topic("topic_c", topic_dir, sampling_ratio=None)
    assert st.schema_version == 2 and st.schema_changed


def test_failure_isolation(spark, tmp_dir):
    reg = SchemaRegistry(spark, f"{tmp_dir}/registry")
    st = reg.run_topic("missing_topic", f"{tmp_dir}/bronze/nope")
    assert st.failure_reason is not None
    # state is still written (best-effort, reference :257-271)
    assert reg.read_state("missing_topic").failure_reason is not None


def test_run_once_discovers_topics(spark, tmp_dir):
    write_bronze(f"{tmp_dir}/bronze/t1", RAPID7_RECORDS)
    write_bronze(f"{tmp_dir}/bronze/t2", RAPID7_RECORDS)
    (Path(tmp_dir) / "bronze" / "_hidden").mkdir(parents=True)
    reg = SchemaRegistry(spark, f"{tmp_dir}/registry")
    results = reg.run_once(f"{tmp_dir}/bronze")
    assert set(results) == {"t1", "t2"}
    assert all(s.schema_version == 1 for s in results.values())
