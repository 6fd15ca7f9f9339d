"""Minimal server-rendered contract browser for the governance service.

ref: packages/dc43-contracts-app (the reference ships a ~12k-LoC FastAPI
web application for browsing contracts, datasets and verdicts). An
analytics engine doesn't need that surface, but operators DO need a
zero-dependency way to eyeball what the service knows — so this module
renders the same core read paths as plain HTML over the existing
``GovernanceServiceServer`` stores:

  /ui                      contract + dataset index
  /ui/contracts/<id>       versions, schema fields, quality rules
  /ui/datasets/<id>        status matrix + contract link + activity

Stdlib-only (``html.escape`` + string templates), read-only, and served
by the same ThreadingHTTPServer routes as the JSON API — bearer auth
applies identically. Driver-side metadata rendering; no Spark involved.
"""

from __future__ import annotations

from html import escape
from typing import Any
from urllib.parse import quote

_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>{title}</title>
<style>
 body {{ font-family: system-ui, sans-serif; margin: 2rem; color: #1a1a1a; }}
 table {{ border-collapse: collapse; margin: 0.75rem 0; }}
 th, td {{ border: 1px solid #ccc; padding: 0.3rem 0.6rem; text-align: left; }}
 th {{ background: #f2f2f2; }}
 code {{ background: #f6f6f6; padding: 0 0.25rem; }}
 .ok {{ color: #0a7a2f; }} .warn {{ color: #a07000; }} .block {{ color: #b00020; }}
</style></head><body>
<p><a href="/ui">index</a></p>
<h1>{title}</h1>
{body}
</body></html>"""


def _table(headers: list[str], rows: list[list[str]]) -> str:
    head = "".join(f"<th>{escape(h)}</th>" for h in headers)
    body = "".join(
        "<tr>" + "".join(f"<td>{cell}</td>" for cell in row) + "</tr>"
        for row in rows
    )
    return f"<table><tr>{head}</tr>{body}</table>"


def _status_cell(status: Any) -> str:
    text = escape(str(status))
    return f'<span class="{text if text in ("ok", "warn", "block") else ""}">{text}</span>'


def render_index(contract_store, governance_store) -> str:
    contract_rows = []
    for cid in contract_store.list_ids():
        versions = contract_store.versions(cid)
        link = f'<a href="/ui/contracts/{quote(cid, safe="")}">{escape(cid)}</a>'
        contract_rows.append([link, escape(", ".join(versions))])
    body = "<h2>Contracts</h2>" + (
        _table(["contract", "versions"], contract_rows)
        if contract_rows
        else "<p>(none)</p>"
    )
    seen: list[str] = []
    for entry in governance_store.activity():
        ds = entry.get("dataset_id")
        if ds and ds not in seen:
            seen.append(ds)
    dataset_rows = [
        [f'<a href="/ui/datasets/{quote(ds, safe="")}">{escape(ds)}</a>']
        for ds in seen
    ]
    body += "<h2>Datasets with activity</h2>" + (
        _table(["dataset"], dataset_rows) if dataset_rows else "<p>(none)</p>"
    )
    from dc43_spark.governance.workflow import list_drafts

    draft_rows = [
        [
            f'<a href="/ui/contracts/{quote(d["contract_id"], safe="")}">'
            f'{escape(d["contract_id"])}</a>',
            escape(d["version"]),
        ]
        for d in list_drafts(contract_store)
    ]
    body += "<h2>Pending drafts</h2>" + (
        _table(["contract", "draft version"], draft_rows)
        if draft_rows
        else "<p>(none)</p>"
    )
    return _PAGE.format(title="dc43 governance", body=body)


def render_contract(contract_store, contract_id: str) -> str | None:
    versions = contract_store.versions(contract_id)
    if not versions:
        return None
    sections = []
    for version in reversed(versions):
        contract = contract_store.get(contract_id, version)
        if contract is None:
            continue
        field_rows = []
        for obj in contract.schema_objects:
            for prop in obj.properties:
                rules = "; ".join(
                    escape(
                        r.rule + (f"={r.value!r}" if r.value is not None else "")
                    )
                    for r in prop.quality
                )
                flags = ", ".join(
                    flag
                    for flag, on in (
                        ("required", prop.required),
                        ("unique", getattr(prop, "unique", False)),
                    )
                    if on
                )
                field_rows.append(
                    [
                        f"<code>{escape(obj.name)}.{escape(prop.name)}</code>",
                        escape(prop.physical_type),
                        escape(flags),
                        rules,
                    ]
                )
        servers = "; ".join(
            escape(s.path or s.table or "?") for s in contract.servers
        )
        sections.append(
            f"<h2>{escape(contract_id)} : {escape(version)}"
            f" <small>({escape(contract.status)})</small></h2>"
            + (f"<p>servers: {servers}</p>" if servers else "")
            + _table(["field", "type", "flags", "quality rules"], field_rows)
        )
    return _PAGE.format(
        title=f"contract {escape(contract_id)}", body="".join(sections)
    )


def render_dataset(governance_store, dataset_id: str) -> str | None:
    matrix = governance_store.status_matrix(dataset_id)
    link = governance_store.get_link(dataset_id)
    activity = governance_store.activity(dataset_id)
    if not matrix and not link and not activity:
        return None
    body = ""
    if link:
        cid = escape(str(link.get("contract_id")))
        body += (
            f"<p>linked contract: <a href=\"/ui/contracts/"
            f"{quote(str(link.get('contract_id')), safe='')}\">{cid}</a>"
            f" : {escape(str(link.get('contract_version')))}</p>"
        )
    body += "<h2>Status matrix</h2>" + (
        _table(
            ["dataset version", "status", "contract version"],
            [
                [
                    escape(str(m.get("dataset_version"))),
                    _status_cell(m.get("status")),
                    escape(str(m.get("contract_version", ""))),
                ]
                for m in matrix
            ],
        )
        if matrix
        else "<p>(none)</p>"
    )
    body += "<h2>Activity</h2>" + (
        _table(
            ["operation", "dataset version", "status"],
            [
                [
                    escape(str(a.get("operation", ""))),
                    escape(str(a.get("dataset_version", ""))),
                    _status_cell(a.get("status", "")),
                ]
                for a in activity
            ],
        )
        if activity
        else "<p>(none)</p>"
    )
    return _PAGE.format(title=f"dataset {escape(dataset_id)}", body=body)
