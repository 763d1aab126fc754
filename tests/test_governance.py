"""Schema-governance loop: drift proposal → human gate → metadata-only
evolution, with the audit trail and time travel across the boundary."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from event_to_lakehouse_spark.registry.governance import Governance
from event_to_lakehouse_spark.storage.snapshots import SnapshotTable


def _seed_table(spark, root):
    t = SnapshotTable(spark, root)
    t.append(
        spark.range(4).select(
            F.col("id"), F.concat(F.lit("h"), F.col("id")).alias("host")
        )
    )
    return t


def _schema(*fields):
    return T.StructType([T.StructField(n, t) for n, t in fields])


def test_governance_safe_loop_and_time_travel(spark, tmp_dir):
    """propose (safe add) → approve → evolved read; the pre-approval
    snapshot still time-travels to the old shape; the audit trail
    records both transitions with versions."""
    root = f"{tmp_dir}/tbl"
    _seed_table(spark, root)
    gov = Governance(spark, root)
    target = _schema(
        ("id", T.LongType()), ("host", T.StringType()), ("site", T.StringType())
    )
    prop = gov.propose(target)
    assert prop.classification == "safe" and prop.status == "pending"
    assert prop.add == {"site": "string"}

    v_pre = gov.table.snapshot().version
    snap = gov.approve(prop.pid, actor="alice")
    assert snap.version == v_pre + 1

    t = SnapshotTable(spark, root)
    assert t.read().columns == ["id", "host", "site"]
    assert t.read().filter(F.col("site").isNull()).count() == 4
    assert t.read(version=v_pre).columns == ["id", "host"]  # time travel

    stored = gov.get(prop.pid)
    assert stored.status == "applied"
    events = [(a["event"], a.get("table_version")) for a in stored.audit]
    assert events == [("proposed", v_pre), ("applied", v_pre + 1)]
    assert stored.audit[1]["actor"] == "alice"


def test_governance_breaking_needs_force(spark, tmp_dir):
    """Dropping a column classifies breaking: approve refuses without
    the explicit human override, applies with it."""
    root = f"{tmp_dir}/tbl"
    _seed_table(spark, root)
    gov = Governance(spark, root)
    prop = gov.propose(_schema(("id", T.LongType())))  # drops host
    assert prop.classification == "breaking"
    with pytest.raises(PermissionError, match="breaking"):
        gov.approve(prop.pid)
    assert gov.get(prop.pid).status == "pending"  # refusal didn't consume it
    gov.approve(prop.pid, allow_breaking=True)
    assert SnapshotTable(spark, root).read().columns == ["id"]


def test_governance_reject_and_replay_protection(spark, tmp_dir):
    root = f"{tmp_dir}/tbl"
    _seed_table(spark, root)
    gov = Governance(spark, root)
    prop = gov.propose(
        _schema(("id", T.LongType()), ("host", T.StringType()),
                ("extra", T.DoubleType()))
    )
    gov.reject(prop.pid, reason="not needed", actor="bob")
    stored = gov.get(prop.pid)
    assert stored.status == "rejected"
    assert stored.audit[-1]["reason"] == "not needed"
    with pytest.raises(ValueError, match="rejected"):
        gov.approve(prop.pid)
    # table untouched
    assert SnapshotTable(spark, root).read().columns == ["id", "host"]
    # in-sync target proposes nothing
    assert gov.propose(_schema(("id", T.LongType()), ("host", T.StringType()))) is None


def test_governance_widening_is_safe_but_writer_side(spark, tmp_dir):
    """int→bigint widening classifies safe with no alter op — the audit
    notes it applies on the next append (writer-side evolution)."""
    root = f"{tmp_dir}/tbl"
    t = SnapshotTable(spark, root)
    t.append(spark.range(3).select(F.col("id").cast("int").alias("n")))
    gov = Governance(spark, root)
    prop = gov.propose(_schema(("n", T.LongType())))
    assert prop.classification == "safe"
    assert prop.add == {} and prop.drop == []
    gov.approve(prop.pid)
    assert "next append" in gov.get(prop.pid).audit[-1]["note"]


def test_governance_cli_roundtrip(spark, tmp_dir, capsys):
    """The full CLI flow the reference's README narrates: registry
    infers v2 with a new field → propose from the registry → approve →
    the governed table reads evolved."""
    from event_to_lakehouse_spark.__main__ import main
    from tests.conftest import write_bronze

    # registry learns a schema with one extra field vs the table
    write_bronze(
        f"{tmp_dir}/bronze/topic_a",
        [{"id": 1, "host": "h1", "site": "eu"}],
        corrupt=False,
    )
    assert main([
        "infer-schemas",
        "--bronze-root", f"{tmp_dir}/bronze",
        "--registry", f"{tmp_dir}/registry",
    ]) == 0
    root = f"{tmp_dir}/tbl"
    t = SnapshotTable(spark, root)
    t.append(
        spark.range(2).select(
            F.col("id"), F.concat(F.lit("h"), F.col("id")).alias("host")
        )
    )
    assert main([
        "governance", "propose", "--table-root", root,
        "--registry", f"{tmp_dir}/registry", "--topic", "topic_a",
    ]) == 0
    out = capsys.readouterr().out
    assert "[safe] p1" in out
    assert main(["governance", "list", "--table-root", root]) == 0
    assert "pending" in capsys.readouterr().out
    assert main([
        "governance", "approve", "--table-root", root, "--id", "p1",
        "--actor", "oncall",
    ]) == 0
    assert "applied" in capsys.readouterr().out
    assert "site" in SnapshotTable(spark, root).read().columns
