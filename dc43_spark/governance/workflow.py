"""Draft review workflow: the write half of the contracts-app surface.

The orchestrator's draft-on-violation hook (ref dc43-service-backends
local.py:2018-2061) leaves ``status='draft'`` contract versions in the
store; the reference contracts-app (packages/dc43-contracts-app
server.py:7776, :9505 and the review pages around them) is where a human
then approves them into circulation. This module is that loop's engine
core, minus the FastAPI/HTML estate: list the pending drafts, approve or
reject one with an audit trail, and (optionally) supersede the previously
active versions — immutable documents throughout, every decision recorded
as governance activity so the status matrix tells the whole story.

Status lifecycle: ``draft -> active`` (approve) or ``draft -> rejected``
(reject); ``active -> deprecated`` when a newer approval supersedes it.
Reads admit only ``active`` by default (io/read.py
DEFAULT_ALLOWED_STATUSES), so approval is precisely the moment a drafted
contract becomes readable in governed pipelines.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.versioning import SemVer


def list_drafts(contract_store) -> list[dict[str, str]]:
    """Every (contract_id, version) pending review, oldest version first.
    Driver-side iteration over store listings — document stores are
    metadata-sized by definition (the 100 TB lives behind the contracts,
    not in them)."""
    out: list[dict[str, str]] = []
    for cid in contract_store.list_ids():
        for version in contract_store.versions(cid):
            contract = contract_store.get(cid, version)
            if contract is not None and contract.status == "draft":
                out.append({"contract_id": cid, "version": version})
    return out


def review_draft(
    contract_store,
    governance_store,
    contract_id: str,
    version: str,
    *,
    decision: str,
    reviewer: str,
    note: str = "",
    supersede: bool = False,
    clock: Optional[Callable[[], str]] = None,
) -> Contract:
    """Approve or reject a pending draft.

    ``decision='approve'`` re-puts the document with ``status='active'``
    (with ``supersede=True`` every OTHER active version of the contract is
    deprecated in the same pass — single-active-version shops);
    ``decision='reject'`` lands ``status='rejected'``, which no read gate
    admits. Raises ``LookupError`` for an unknown document and
    ``ValueError`` when the document is not a draft — double-approving is
    a workflow bug worth surfacing, not an idempotent no-op, because the
    second reviewer believes they decided something.

    Every decision is recorded as governance activity
    (``operation='contract_review'``) so ``activity()`` / the status
    matrix audit who moved a contract into circulation and why."""
    if decision not in ("approve", "reject"):
        raise ValueError(f"decision must be approve|reject, got {decision!r}")
    contract = contract_store.get(contract_id, version)
    if contract is None:
        raise LookupError(f"contract {contract_id}:{version} not found")
    if contract.status != "draft":
        raise ValueError(
            f"contract {contract_id}:{version} is {contract.status!r}, not a draft"
        )
    doc = contract.to_dict()
    doc["status"] = "active" if decision == "approve" else "rejected"
    reviewed = Contract.from_dict(doc)
    contract_store.put(reviewed)

    deprecated: list[str] = []
    if decision == "approve" and supersede:
        for other in contract_store.versions(contract_id):
            if other == version:
                continue
            prior = contract_store.get(contract_id, other)
            if prior is not None and prior.status == "active":
                prior_doc = prior.to_dict()
                prior_doc["status"] = "deprecated"
                contract_store.put(Contract.from_dict(prior_doc))
                deprecated.append(other)

    if governance_store is not None:
        entry: dict[str, Any] = {
            "operation": "contract_review",
            "contract_id": contract_id,
            "contract_version": version,
            "decision": decision,
            "status": reviewed.status,
            "reviewer": reviewer,
        }
        if note:
            entry["note"] = note
        if deprecated:
            entry["deprecated_versions"] = deprecated
        if clock is not None:
            entry["ts"] = clock()
        governance_store.record_activity(entry)
    return reviewed


def _next_authored_version(contract_store, contract_id: str, base: Optional[str]) -> str:
    """Minor-bump of the base (default: highest parseable existing
    version, else 0.0.0) with an ``-draft-authored-<n>`` suffix; ``n``
    increments past any existing collision so authored versions are
    deterministic without a clock (documents are immutable — a version
    string is never reused)."""
    target: Optional[tuple] = None
    candidates = [base] if base else contract_store.versions(contract_id)
    for v in candidates or []:
        try:
            sv = SemVer.parse(v)
        except ValueError:
            continue
        if sv.prerelease:
            # a draft is a prerelease OF its core: new drafts join the
            # same release target instead of consuming another bump
            core = (sv.major, sv.minor, sv.patch)
        else:
            b = SemVer(sv.major, sv.minor, sv.patch).bump("minor")
            core = (b.major, b.minor, b.patch)
        if target is None or core > target:
            target = core
    bumped = SemVer(*target) if target else SemVer(0, 1, 0)
    stem = f"{bumped.major}.{bumped.minor}.{bumped.patch}-draft-authored"
    n = 1
    existing = set(contract_store.versions(contract_id))
    while f"{stem}-{n}" in existing:
        n += 1
    return f"{stem}-{n}"


def author_draft(
    contract_store,
    governance_store,
    document: dict,
    *,
    author: str = "",
    note: str = "",
) -> Contract:
    """Create a brand-new contract draft from a submitted document — the
    authoring half of the contracts-app surface (ref dc43-contracts-app
    server.py contract create/edit forms). The document is ODCS-shaped
    (``Contract.from_dict``); whatever status it claims, it enters the
    store as ``status='draft'`` so nothing reaches a governed read
    without passing ``review_draft``. Version: honored if supplied (and
    free), else ``_next_authored_version``. Raises ``ValueError`` on a
    schema-less document or a version collision (documents are
    immutable)."""
    doc = dict(document)
    contract_id = str(doc.get("id") or "")
    if not contract_id:
        raise ValueError("authored contract document needs an 'id'")
    version = str(doc.get("version") or "") or _next_authored_version(
        contract_store, contract_id, None
    )
    if contract_store.get(contract_id, version) is not None:
        raise ValueError(
            f"contract {contract_id}:{version} already exists; documents are "
            "immutable — author a new version instead"
        )
    doc["version"] = version
    doc["status"] = "draft"
    contract = Contract.from_dict(doc)
    if not contract.schema_objects or not contract.schema_object.properties:
        raise ValueError("authored contract needs at least one schema property")
    contract_store.put(contract)
    if governance_store is not None:
        entry = {
            "operation": "contract_authored",
            "contract_id": contract_id,
            "contract_version": version,
            "author": author,
        }
        if note:
            entry["note"] = note
        governance_store.record_activity(entry)
    return contract


def edit_draft(
    contract_store,
    governance_store,
    contract_id: str,
    base_version: str,
    changes: dict,
    *,
    author: str = "",
    note: str = "",
) -> Contract:
    """Edit = author a NEW draft from an existing version (any status)
    with ``changes`` overlaid — documents are immutable, so editing
    never touches the base. ``changes`` replaces top-level document
    sections (``schema``, ``description``, ``customProperties``, ...);
    id/version/status are managed here and cannot be overridden. The new
    version is a minor bump of the base with the authored-draft suffix."""
    base = contract_store.get(contract_id, base_version)
    if base is None:
        raise LookupError(f"contract {contract_id}:{base_version} not found")
    doc = base.to_dict()
    for key, value in changes.items():
        if key in ("id", "version", "status"):
            raise ValueError(f"edit cannot override {key!r}")
        doc[key] = value
    doc["version"] = _next_authored_version(contract_store, contract_id, base_version)
    entry_note = note or f"edited from {base_version}"
    return author_draft(
        contract_store, governance_store, doc, author=author, note=entry_note
    )


def latest_active(contract_store, contract_id: str) -> Optional[Contract]:
    """Highest-semver ACTIVE version — what a governed read resolves after
    reviews have moved statuses around."""
    best: Optional[Contract] = None
    for version in contract_store.versions(contract_id):
        contract = contract_store.get(contract_id, version)
        if contract is None or contract.status != "active":
            continue
        if best is None or SemVer.parse(version) > SemVer.parse(best.version):
            best = contract
    return best
