"""Config-driven normalization contracts (SURVEY §7.2 step 3).

The reference hand-writes ~30 ``withColumn`` calls per source
(``scripts/bronze_assets_to_silver_assets.py:91-162`` rapid7,
``:198-268`` fortisiem). Here the same semantics are DATA: a target
contract (ordered name→type) plus one source→target expression mapping
per source. ``pipeline.normalize.apply_mapping`` compiles a mapping
into a single ``select`` — same Catalyst plan the reference's
withColumn chain collapses to, but declared, diffable, and testable.

Faithfulness notes (checked against the reference line-by-line):

- surrogate key: sha2(concat_ws("|", lower(trim(hostname)),
  lower(trim(ip-ish)), id), 256) — the id component is NOT
  canonicalized in the reference (:139-149, :244-255); we preserve
  that exactly.
- rapid7 keys on ``primary_ip``; fortisiem keys on ``access_ip``.
- unmapped targets become typed NULLs (:96-110, :219-237).
- ``$``-named Mongo field ``_id.$oid`` needs backtick quoting in the
  expression string (:172-174, :203).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class UidSpec:
    """sha2-256 surrogate key over pipe-joined components.

    ``canonicalized`` components get lower(trim(x)); ``raw`` components
    are used as-is (reference :139-149)."""

    canonicalized: tuple[str, ...]
    raw: tuple[str, ...]


@dataclass(frozen=True)
class SourceMapping:
    """One bronze source → silver contract mapping."""

    source_system: str
    # target column -> Spark SQL expression over the bronze schema.
    # Targets absent here become typed NULLs.
    exprs: dict[str, str]
    uid: UidSpec
    uid_target: str = "asset_uid"


# Ordered 32-column silver assets contract
# (bronze_assets_to_silver_assets.py:150-162 == :256-268; FIXTURES.md §B3).
SILVER_ASSETS_CONTRACT: list[tuple[str, str]] = [
    ("asset_uid", "string"),
    ("source_system", "string"),
    ("ingest_ts", "timestamp"),
    ("rapid7_id", "string"),
    ("fortisiem_id", "string"),
    ("asset_name", "string"),
    ("primary_hostname", "string"),
    ("primary_ip", "string"),
    ("access_ip", "string"),
    ("natural_id", "string"),
    ("approved", "boolean"),
    ("unmanaged", "boolean"),
    ("device_vendor", "string"),
    ("device_model", "string"),
    ("device_version", "string"),
    ("os_name", "string"),
    ("os_family", "string"),
    ("os_vendor", "string"),
    ("os_product", "string"),
    ("os_version", "string"),
    ("os_architecture", "string"),
    ("os_certainty", "double"),
    ("assessed_for_policies", "boolean"),
    ("assessed_for_vulnerabilities", "boolean"),
    ("risk_score", "double"),
    ("raw_risk_score", "double"),
    ("vuln_total", "int"),
    ("vuln_critical", "int"),
    ("vuln_severe", "int"),
    ("vuln_moderate", "int"),
    ("vuln_exploits", "int"),
    ("vuln_malware_kits", "int"),
    ("raw_json", "string"),
]

# rapid7 mapping (reference :91-149)
RAPID7_MAPPING = SourceMapping(
    source_system="rapid7",
    exprs={
        "rapid7_id": "cast(id as string)",
        "asset_name": "hostName",
        "primary_hostname": "hostName",
        "primary_ip": "ip",
        "os_name": "os",
        "os_family": "osFingerprint.family",
        "os_vendor": "osFingerprint.vendor",
        "os_product": "osFingerprint.product",
        "os_version": "osFingerprint.cpe.version",
        "os_architecture": "osFingerprint.architecture",
        "os_certainty": "cast(osCertainty as double)",
        "assessed_for_policies": "assessedForPolicies",
        "assessed_for_vulnerabilities": "assessedForVulnerabilities",
        "risk_score": "cast(riskScore as double)",
        "raw_risk_score": "cast(rawRiskScore as double)",
        "vuln_total": "cast(vulnerabilities.total as int)",
        "vuln_critical": "cast(vulnerabilities.critical as int)",
        "vuln_severe": "cast(vulnerabilities.severe as int)",
        "vuln_moderate": "cast(vulnerabilities.moderate as int)",
        "vuln_exploits": "cast(vulnerabilities.exploits as int)",
        "vuln_malware_kits": "cast(vulnerabilities.malwareKits as int)",
    },
    uid=UidSpec(
        canonicalized=("primary_hostname", "primary_ip"), raw=("rapid7_id",)
    ),
)

# fortisiem mapping (reference :198-255); note the $-named Mongo field.
FORTISIEM_MAPPING = SourceMapping(
    source_system="fortisiem",
    exprs={
        "fortisiem_id": "cast(`_id`.`$oid` as string)",
        "asset_name": "name",
        "primary_hostname": "name",
        "access_ip": "accessIp",
        "natural_id": "naturalId",
        "approved": "approved",
        "unmanaged": "unmanaged",
        "device_vendor": "deviceType.vendor",
        "device_model": "deviceType.model",
        "device_version": "deviceType.version",
    },
    uid=UidSpec(
        canonicalized=("primary_hostname", "access_ip"), raw=("fortisiem_id",)
    ),
)
