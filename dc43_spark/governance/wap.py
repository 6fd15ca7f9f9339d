"""Governed write-audit-publish: the contract engine IS the audit.

``io/snaplog.py``'s WAP branches give atomicity (readers never see
in-flight work, publish is one fast-forward commit); this module gives
the A: the branch head is evaluated against an ODCS contract through
the full governance loop — schema snapshot, one-pass metrics, verdict
derivation, status + activity records, draft-on-block — and the
publish happens ONLY when the verdict clears the bar. A blocked branch
stays on disk, fully inspectable, with its verdict recorded under a
branch-scoped dataset version; nothing ever reached the source table.

This is the engine-level twin of the reference's write-validation
pipeline (ref spark/io/write.py violation strategies; SURVEY §2 G3/G4):
instead of routing bad ROWS (split/flag), it gates a whole BATCH OF
COMMITS behind the verdict, which is the shape a staging/ingest
pipeline at 100 TB wants — audit once over the staged delta, then an
O(files changed) metadata publish.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

from dc43_spark.governance.orchestrator import EvaluationOutcome, GovernanceService
from dc43_spark.io.snaplog import SnaplogTable


@dataclass
class WapResult:
    """What the governed publish did: the verdict always exists; the
    source version only when the branch actually landed."""

    published: bool
    verdict: str  # "ok" | "warn" | "block"
    outcome: EvaluationOutcome
    source_version: Optional[int]
    branch_path: str


def governed_publish(
    service: GovernanceService,
    source: SnaplogTable,
    branch: SnaplogTable,
    contract_id: str,
    *,
    contract_selector: str = "latest",
    dataset_id: Optional[str] = None,
    pipeline: str = "wap",
    publish_on: Sequence[str] = ("ok",),
    track_drift: bool = False,
) -> WapResult:
    """Audit ``branch`` against ``contract_id`` and publish to ``source``
    iff the verdict status is in ``publish_on`` (default: only ``ok``;
    pass ``("ok", "warn")`` to let warnings through).

    The evaluation runs over the branch HEAD (the exact rows a publish
    would land — publish is a net-effect commit, so auditing the head
    audits the publish). The verdict is recorded under dataset version
    ``wap-branch-v<N>`` so a later successful publish of a fixed branch
    gets its own distinguishable record. Blocked publishes leave the
    source untouched and the branch intact for inspection or repair;
    with ``service.draft_on_block`` the outcome carries the auto-drafted
    contract proposal, same as any governed write."""
    contract = service.resolve_contract(contract_id, contract_selector)
    bhead = branch.version()
    outcome = service.evaluate_dataset(
        branch.read(),
        contract,
        dataset_id=dataset_id or source.path,
        dataset_version=f"wap-branch-v{bhead}",
        operation="write",
        pipeline=pipeline,
        track_drift=track_drift,
    )
    status = outcome.validation.status
    if status not in publish_on:
        return WapResult(False, status, outcome, None, branch.path)
    version = source.publish(branch)
    return WapResult(True, status, outcome, version, branch.path)
