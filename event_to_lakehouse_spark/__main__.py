"""Job launcher: ``python -m event_to_lakehouse_spark <job> ...``.

The reference ships its two jobs as bare spark-submit scripts
(docker-compose.yml:324-345); this CLI is the equivalent operational
surface for this engine's jobs, sharing one session factory.
"""

from __future__ import annotations

import argparse
import json
import sys

from .session import get_spark


def _cmd_infer_schemas(args) -> int:
    from .registry.schema_registry import SchemaRegistry

    spark = get_spark("schema-inferer")
    reg = SchemaRegistry(spark, args.registry)
    states = reg.run_once(args.bronze_root, sampling_ratio=args.sampling_ratio)
    for topic, st in states.items():
        status = "FAIL" if st.failure_reason else ("OK" if st.schema_changed else "SKIP")
        print(f"[{status}] {topic}: v{st.schema_version} {st.failure_reason or ''}")
    return 1 if any(s.failure_reason for s in states.values()) else 0


def _cmd_normalize(args) -> int:
    from .pipeline.contracts import FORTISIEM_MAPPING, RAPID7_MAPPING
    from .pipeline.normalize import (
        apply_mapping,
        read_bronze,
        silver_union,
        start_silver_stream,
        write_silver_batch,
    )
    from pyspark.sql import types as T

    mappings = {"rapid7": RAPID7_MAPPING, "fortisiem": FORTISIEM_MAPPING}
    spark = get_spark("bronze-to-silver")
    outs = []
    for spec in args.source:  # name=path=schema.json
        name, path, schema_file = spec.split("=", 2)
        with open(schema_file) as f:
            schema = T.StructType.fromJson(json.load(f))
        bronze = read_bronze(spark, path, schema, streaming=args.stream)
        if args.quarantine and not args.stream:
            from .pipeline.normalize import split_corrupt, write_quarantine

            bronze, corrupt = split_corrupt(bronze)
            write_quarantine(corrupt, args.quarantine, source_system=name)
        outs.append(apply_mapping(bronze, mappings[name]))
    silver = silver_union(*outs) if len(outs) > 1 else outs[0]
    if args.stream:
        q = start_silver_stream(silver, args.out, args.checkpoint)
        q.awaitTermination()
    else:
        write_silver_batch(silver, args.out)
    return 0


def _cmd_refresh_rollup(args) -> int:
    from .storage.rollup import RollupView
    from .storage.snapshots import SnapshotTable

    spark = get_spark("rollup-refresh")
    fact = SnapshotTable(spark, args.fact)
    view = RollupView(
        spark,
        args.view,
        keys=[c for c in args.keys.split(",") if c],
        sums=[c for c in args.sums.split(",") if c],
        mins=[c for c in args.mins.split(",") if c],
        maxs=[c for c in args.maxs.split(",") if c],
    )
    snap = view.refresh(fact)
    print(
        f"[OK] view at v{snap.version if snap else 0}, "
        f"folded through fact v{view._folded_version(view.table.snapshot())}"
    )
    return 0


def _cmd_refresh_gold(args) -> int:
    from .pipeline.gold import refresh_gold, start_gold_refresh_stream

    spark = get_spark("silver-to-gold")
    if args.stream:
        q = start_gold_refresh_stream(
            spark, args.silver, args.gold_root, args.checkpoint, top_n=args.top_n
        )
        q.awaitTermination()
        return 0
    marts = refresh_gold(spark, args.silver, args.gold_root, top_n=args.top_n)
    for name, path in marts.items():
        print(f"[OK] {name}: {path}")
    return 0


def _cmd_compact(args) -> int:
    from .storage.compaction import compact

    spark = get_spark("compaction")
    n = compact(
        spark,
        args.path,
        args.target_bytes,
        args.sort_by.split(",") if args.sort_by else None,
        zorder_cols=args.zorder_by.split(",") if args.zorder_by else None,
    )
    print(f"compacted {args.path} -> {n} files")
    return 0


def _cmd_snapshot(args) -> int:
    from .storage.snapshots import SnapshotTable

    spark = get_spark("snapshot-table")
    t = SnapshotTable(
        spark,
        args.root,
        stats_col=args.stats_col,
        stats_cols=args.stats_cols.split(",") if args.stats_cols else None,
    )
    if args.action == "compact":
        from .storage.compaction import compact_snapshot

        n = compact_snapshot(
            t,
            target_file_bytes=args.target_bytes,
            sort_cols=args.sort_by.split(",") if args.sort_by else None,
            zorder_cols=args.zorder_by.split(",") if args.zorder_by else None,
        )
        print(f"compacted snapshot table -> {n} files")
    elif args.action == "history":
        for v in t.history():
            s = t.snapshot(v)
            rows = sum(f["rows"] for f in s.files)
            print(f"v{v}: {len(s.files)} files, {rows} rows")
    elif args.action == "vacuum":
        print(f"removed {t.vacuum(keep_versions=args.keep)} files")
    elif args.action == "expire":
        if args.older_than is None:
            raise SystemExit("expire requires --older-than SECONDS")
        print(f"removed {t.expire_snapshots(older_than_s=args.older_than)} files")
    elif args.action == "alter":
        # One --add per column: the type half of name:type may itself
        # contain commas (decimal(10,2), map<string,int>), so a comma
        # list cannot be split safely.
        add = dict(kv.split(":", 1) for kv in (args.add or []) if kv) or None
        drop = [c for c in args.drop.split(",") if c] or None
        s = t.alter_schema(add=add, drop=drop)
        print(f"v{s.version}: schema now {[f['name'] for f in s.schema['fields']]}")
    elif args.action == "schema":
        snap = t.snapshot(args.version)
        if snap is None or snap.schema is None:
            print("no pinned schema")
        else:
            for f in snap.schema["fields"]:
                print(f"{f['name']}\t{f['type']}")
    elif args.action == "count":
        print(t.read(version=args.version).count())
    elif args.action == "tag":
        if not args.name:
            raise SystemExit("tag requires --name")
        v = t.tag(args.name, version=args.version)
        print(f"tag {args.name} -> v{v}")
    elif args.action == "tags":
        for name, v in sorted(t.tags().items()):
            print(f"{name}\tv{v}")
    elif args.action == "drop-tag":
        if not args.name:
            raise SystemExit("drop-tag requires --name")
        t.drop_tag(args.name)
        print(f"dropped {args.name}")
    elif args.action == "prune":
        snap = t.snapshot()
        files = snap.files
        if args.between:
            lo, hi = args.between.split(",", 1)
            col = args.stats_col or t.stats_col
            kept = t._prune_box(files, {col: (_coerce(lo), _coerce(hi))})
            print(f"zone maps [{col}]: {len(kept)}/{len(files)} files kept")
        if args.point is not None:
            pos = t._bloom_positions(args.point)
            kept = [f for f in files if t._bloom_may_contain(f, pos)]
            print(f"bloom [{t.bloom_col}]: {len(kept)}/{len(files)} files kept")
    return 0


def _cmd_governance(args) -> int:
    from pyspark.sql import types as T

    from .registry.governance import Governance

    spark = get_spark("schema-governance")
    gov = Governance(spark, args.table_root)
    if args.action == "propose":
        if args.schema_file:
            with open(args.schema_file) as f:
                target = T.StructType.fromJson(json.load(f))
        else:
            from .registry.schema_registry import SchemaRegistry

            latest = SchemaRegistry(spark, args.registry).latest_schema(args.topic)
            if latest is None:
                raise SystemExit(f"no registered schema for topic {args.topic}")
            target = T.StructType.fromJson(json.loads(latest))
        prop = gov.propose(target, actor=args.actor)
        if prop is None:
            print("in sync: nothing to propose")
        else:
            print(f"[{prop.classification}] {prop.pid}: "
                  f"+{len(prop.add)} -{len(prop.drop)} pending")
    elif args.action == "list":
        for p in gov.list_proposals():
            print(f"{p.pid}\t{p.status}\t{p.classification}\t{p.created_utc}")
    elif args.action == "approve":
        snap = gov.approve(args.id, actor=args.actor, allow_breaking=args.force)
        print(f"{args.id} applied -> v{snap.version}")
    elif args.action == "reject":
        gov.reject(args.id, args.reason or "rejected via cli", actor=args.actor)
        print(f"{args.id} rejected")
    return 0


def _coerce(v: str):
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            continue
    return v


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="event_to_lakehouse_spark")
    sub = p.add_subparsers(dest="job", required=True)

    s = sub.add_parser("infer-schemas", help="registry maintenance pass")
    s.add_argument("--bronze-root", required=True)
    s.add_argument("--registry", required=True)
    s.add_argument("--sampling-ratio", type=float, default=0.2)
    s.set_defaults(fn=_cmd_infer_schemas)

    s = sub.add_parser("normalize", help="bronze -> silver")
    s.add_argument(
        "--source", action="append", required=True,
        metavar="NAME=PATH=SCHEMA_JSON",
    )
    s.add_argument("--out", required=True)
    s.add_argument("--stream", action="store_true")
    s.add_argument("--checkpoint")
    s.add_argument(
        "--quarantine",
        help="batch mode: write corrupt rows here (replayable) instead of dropping",
    )
    s.set_defaults(fn=_cmd_normalize)

    s = sub.add_parser("refresh-gold", help="silver -> gold marts")
    s.add_argument("--silver", required=True)
    s.add_argument("--gold-root", required=True)
    s.add_argument("--top-n", type=int, default=10)
    s.add_argument("--stream", action="store_true",
                   help="watch silver and rebuild marts per micro-batch")
    s.add_argument("--checkpoint")
    s.set_defaults(fn=_cmd_refresh_gold)

    s = sub.add_parser(
        "refresh-rollup",
        help="fold a fact table's new commits into a maintained "
        "aggregate view (O(delta)+O(view) per run)",
    )
    s.add_argument("--fact", required=True, help="fact SnapshotTable root")
    s.add_argument("--view", required=True, help="view SnapshotTable root")
    s.add_argument("--keys", required=True, help="comma-separated group keys")
    s.add_argument("--sums", default="", help="comma-separated sum measures")
    s.add_argument("--mins", default="", help="comma-separated min measures")
    s.add_argument("--maxs", default="", help="comma-separated max measures")
    s.set_defaults(fn=_cmd_refresh_rollup)

    s = sub.add_parser("compact", help="bin-pack small parquet files")
    s.add_argument("--path", required=True)
    s.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    s.add_argument("--sort-by", default="")
    s.add_argument("--zorder-by", default="",
                   help="Morton-cluster by these columns (OPTIMIZE ZORDER)")
    s.set_defaults(fn=_cmd_compact)

    s = sub.add_parser("snapshot", help="snapshot-table maintenance")
    s.add_argument("action",
                   choices=["history", "vacuum", "expire", "count", "compact",
                            "prune", "alter", "schema", "tag", "tags",
                            "drop-tag"])
    s.add_argument("--root", required=True)
    s.add_argument("--stats-col")
    s.add_argument("--stats-cols", default="",
                   help="comma list: multi-column zone-map stats")
    s.add_argument("--keep", type=int, default=1)
    s.add_argument("--version", type=int)
    s.add_argument("--target-bytes", type=int, default=128 * 1024 * 1024)
    s.add_argument("--sort-by", default="")
    s.add_argument("--zorder-by", default="",
                   help="Morton-cluster by these columns (OPTIMIZE ZORDER)")
    s.add_argument("--between", default="",
                   help="lo,hi bounds for a zone-map prune report")
    s.add_argument("--point", default=None,
                   help="key value for a bloom prune report")
    s.add_argument("--name", help="tag/drop-tag: the ref name")
    s.add_argument("--older-than", type=int, default=None,
                   help="expire: drop snapshots committed more than this many seconds ago")
    s.add_argument("--add", action="append", default=[],
                   metavar="NAME:TYPE",
                   help="alter: column to add; repeat the flag per column "
                        "(types may contain commas, e.g. decimal(10,2))")
    s.add_argument("--drop", default="",
                   help="alter: comma list of columns to drop (metadata-only)")
    s.set_defaults(fn=_cmd_snapshot)

    s = sub.add_parser(
        "governance",
        help="schema drift proposals: propose/list/approve/reject "
             "(the reference's human-in-the-loop normalization)",
    )
    s.add_argument("action", choices=["propose", "list", "approve", "reject"])
    s.add_argument("--table-root", required=True)
    s.add_argument("--registry", help="propose: pull the topic's latest schema")
    s.add_argument("--topic")
    s.add_argument("--schema-file",
                   help="propose: explicit target StructType json")
    s.add_argument("--id", help="approve/reject: proposal id")
    s.add_argument("--force", action="store_true",
                   help="approve a BREAKING proposal (the human gate)")
    s.add_argument("--reason", help="reject: audit-trail reason")
    s.add_argument("--actor", default="cli")
    s.set_defaults(fn=_cmd_governance)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
