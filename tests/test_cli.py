"""CLI job launcher: end-to-end over the in-process session."""

from __future__ import annotations

import json
from pathlib import Path

from event_to_lakehouse_spark.__main__ import main
from tests.conftest import RAPID7_RECORDS, write_bronze


def test_infer_schemas_cli(spark, tmp_dir, capsys):
    write_bronze(f"{tmp_dir}/bronze/topic_a", RAPID7_RECORDS)
    rc = main(
        [
            "infer-schemas",
            "--bronze-root", f"{tmp_dir}/bronze",
            "--registry", f"{tmp_dir}/registry",
        ]
    )
    assert rc == 0
    assert "[OK] topic_a: v1" in capsys.readouterr().out
    v1 = Path(f"{tmp_dir}/registry/topic_a/schema/v1.json")
    assert v1.exists() and "hostName" in v1.read_text()


def test_normalize_cli_batch(spark, tmp_dir):
    from tests.test_pipeline_golden import RAPID7_SCHEMA

    bronze = write_bronze(f"{tmp_dir}/bronze/rapid7", RAPID7_RECORDS)
    schema_file = Path(tmp_dir) / "rapid7_schema.json"
    schema_file.write_text(json.dumps(json.loads(RAPID7_SCHEMA.json())))
    rc = main(
        [
            "normalize",
            "--source", f"rapid7={bronze}={schema_file}",
            "--out", f"{tmp_dir}/silver",
        ]
    )
    assert rc == 0
    back = spark.read.parquet(f"{tmp_dir}/silver")
    assert back.count() == 2
    assert {r.source_system for r in back.collect()} == {"rapid7"}


def test_compact_cli(spark, tmp_dir):
    import pyspark.sql.functions as F

    path = f"{tmp_dir}/tiny"
    spark.range(1000).select(F.col("id")).repartition(20).write.parquet(path)
    rc = main(["compact", "--path", path])
    assert rc == 0
    assert spark.read.parquet(path).count() == 1000


def test_refresh_gold_cli(spark, tmp_dir, capsys):
    from tests.test_pipeline_golden import RAPID7_SCHEMA

    bronze = write_bronze(f"{tmp_dir}/bronze/rapid7", RAPID7_RECORDS)
    schema_file = Path(tmp_dir) / "rapid7_schema.json"
    schema_file.write_text(json.dumps(json.loads(RAPID7_SCHEMA.json())))
    assert main(
        [
            "normalize",
            "--source", f"rapid7={bronze}={schema_file}",
            "--out", f"{tmp_dir}/silver",
        ]
    ) == 0
    rc = main(
        [
            "refresh-gold",
            "--silver", f"{tmp_dir}/silver",
            "--gold-root", f"{tmp_dir}/gold",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "[OK] asset_posture" in out
    assert spark.read.parquet(f"{tmp_dir}/gold/current_assets").count() == 2


def test_normalize_cli_quarantine(spark, tmp_dir):
    from tests.test_pipeline_golden import RAPID7_SCHEMA

    bronze = write_bronze(f"{tmp_dir}/bronze/rapid7", RAPID7_RECORDS)
    schema_file = Path(tmp_dir) / "rapid7_schema.json"
    schema_file.write_text(json.dumps(json.loads(RAPID7_SCHEMA.json())))
    rc = main(
        [
            "normalize",
            "--source", f"rapid7={bronze}={schema_file}",
            "--out", f"{tmp_dir}/silver",
            "--quarantine", f"{tmp_dir}/quarantine",
        ]
    )
    assert rc == 0
    assert spark.read.parquet(f"{tmp_dir}/silver").count() == 2
    q = spark.read.parquet(f"{tmp_dir}/quarantine")
    assert q.count() == 1  # the corrupt record, preserved for replay
    assert q.first().source_system == "rapid7"


def test_snapshot_cli(spark, tmp_dir, capsys):
    import pyspark.sql.functions as F

    from event_to_lakehouse_spark.storage.snapshots import SnapshotTable

    root = f"{tmp_dir}/tbl"
    t = SnapshotTable(spark, root)
    t.append(spark.range(10).select(F.col("id")))
    t.append(spark.range(10, 30).select(F.col("id")))

    assert main(["snapshot", "history", "--root", root]) == 0
    out = capsys.readouterr().out
    assert "v1:" in out and "v2:" in out

    assert main(["snapshot", "count", "--root", root]) == 0
    assert capsys.readouterr().out.strip() == "30"


def test_snapshot_prune_cli(spark, tmp_dir, capsys):
    import pyspark.sql.functions as F

    from event_to_lakehouse_spark.storage.snapshots import SnapshotTable

    root = f"{tmp_dir}/tbl"
    t = SnapshotTable(spark, root, stats_cols=["id"], bloom_col="id")
    t.append(spark.range(100).select(F.col("id")).repartitionByRange(4, "id"))

    assert main(
        ["snapshot", "prune", "--root", root, "--between", "0,10"]
    ) == 0
    out = capsys.readouterr().out
    assert "zone maps [id]: 1/4 files kept" in out

    assert main(["snapshot", "prune", "--root", root, "--point", "7"]) == 0
    out = capsys.readouterr().out
    assert "bloom [id]:" in out and "/4 files kept" in out


def test_snapshot_alter_and_expire_cli(spark, tmp_dir, capsys):
    import pyspark.sql.functions as F

    from event_to_lakehouse_spark.storage.snapshots import SnapshotTable

    root = f"{tmp_dir}/tbl"
    t = SnapshotTable(spark, root)
    t.append(spark.range(5).select(F.col("id")))

    assert main(["snapshot", "alter", "--root", root, "--add", "tag:string"]) == 0
    assert "tag" in capsys.readouterr().out
    assert main(["snapshot", "schema", "--root", root]) == 0
    out = capsys.readouterr().out
    assert "id" in out and "tag" in out

    # expire with a huge cutoff removes nothing; latest always survives
    assert main(
        ["snapshot", "expire", "--root", root, "--older-than", "999999"]
    ) == 0
    assert "removed 0 files" in capsys.readouterr().out
    assert SnapshotTable(spark, root).read().columns == ["id", "tag"]


def test_snapshot_alter_comma_types_cli(spark, tmp_dir, capsys):
    """Types whose simpleString contains commas — decimal(10,2),
    map<string,int> — must survive CLI parsing: one --add flag per
    column (a comma-separated list would tear the type apart)."""
    import pyspark.sql.functions as F

    from event_to_lakehouse_spark.storage.snapshots import SnapshotTable

    root = f"{tmp_dir}/tbl"
    SnapshotTable(spark, root).append(spark.range(3).select(F.col("id")))
    rc = main(
        [
            "snapshot", "alter", "--root", root,
            "--add", "price:decimal(10,2)",
            "--add", "attrs:map<string,int>",
        ]
    )
    assert rc == 0
    assert "price" in capsys.readouterr().out
    schema = SnapshotTable(spark, root).read().schema
    assert schema["price"].dataType.simpleString() == "decimal(10,2)"
    assert schema["attrs"].dataType.simpleString() == "map<string,int>"


def test_snapshot_tag_cli(spark, tmp_dir, capsys):
    import pyspark.sql.functions as F

    from event_to_lakehouse_spark.storage.snapshots import SnapshotTable

    root = f"{tmp_dir}/tbl"
    t = SnapshotTable(spark, root)
    t.append(spark.range(4).select(F.col("id")))
    assert main(["snapshot", "tag", "--root", root, "--name", "baseline"]) == 0
    assert "baseline -> v1" in capsys.readouterr().out
    t.append(spark.range(4, 10).select(F.col("id")))
    assert main(["snapshot", "tags", "--root", root]) == 0
    assert "baseline\tv1" in capsys.readouterr().out
    assert SnapshotTable(spark, root).read(tag="baseline").count() == 4
    assert main(["snapshot", "drop-tag", "--root", root, "--name", "baseline"]) == 0
    assert SnapshotTable(spark, root).tags() == {}


def test_refresh_rollup_cli(spark, tmp_dir, capsys):
    """Two CLI runs: the first bootstraps the view, the second folds
    only the newly appended fact commit; the served view equals the
    full groupBy at each point."""
    from pyspark.sql import functions as F

    from event_to_lakehouse_spark.storage.snapshots import SnapshotTable
    from event_to_lakehouse_spark.tables import load_tables

    orders = load_tables(spark, "/root/testdata/sf0.001")["orders"].select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    fact = SnapshotTable(spark, f"{tmp_dir}/fact")
    fact.append(orders.filter(F.col("o_orderkey") % 2 == 0))

    argv = [
        "refresh-rollup",
        "--fact", f"{tmp_dir}/fact",
        "--view", f"{tmp_dir}/view",
        "--keys", "o_orderstatus",
        "--sums", "o_totalprice",
    ]
    assert main(argv) == 0
    assert "folded through fact v1" in capsys.readouterr().out

    fact.append(orders.filter(F.col("o_orderkey") % 2 == 1))
    assert main(argv) == 0
    assert "folded through fact v2" in capsys.readouterr().out

    got = {
        (r.o_orderstatus, r.n_rows)
        for r in spark.read.parquet(
            *SnapshotTable(spark, f"{tmp_dir}/view").snapshot().paths
        ).collect()
    }
    want = {
        (r.o_orderstatus, r.n)
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
