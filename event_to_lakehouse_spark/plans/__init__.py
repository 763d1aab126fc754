from .audit import PlanAudit, audit_plan  # noqa: F401
