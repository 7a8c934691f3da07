"""Plan inspection & audit (SURVEY.md §4).

We write zero custom Catalyst rules — the value here is *verifying*
that Catalyst produced the plan we want: filters pushed to the parquet
scan, columns pruned, dimensions broadcast, codegen spans wide. The
audit utilities make those properties assertable in tests and
reportable per round.
"""

from .audit import plan_string, audit_plan, PlanAudit  # noqa: F401
