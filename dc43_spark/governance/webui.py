"""Minimal server-rendered contract browser for the governance service.

ref: packages/dc43-contracts-app (the reference ships a ~12k-LoC FastAPI
web application for browsing contracts, datasets and verdicts). An
analytics engine doesn't need that surface, but operators DO need a
zero-dependency way to eyeball what the service knows — so this module
renders the same core read paths as plain HTML over the existing
``GovernanceServiceServer`` stores:

  /ui                      contract + dataset index
  /ui/contracts/<id>       versions, schema fields, quality rules
  /ui/contracts/<id>/<v>/edit  pre-filled edit form -> new draft (r12,
                           ref server.py edit_contract_form: the base
                           version pre-loads, the save lands as a new
                           version — here via the review workflow)
  /ui/contracts/<id>/diff?from=<v>&to=<v>  field-level version diff
                           (r12, the reference editor's baseline-vs-
                           edited diff as a server-rendered page)
  /ui/datasets             all datasets x latest verdict (the landing
                           matrix of the reference app's dataset routes)
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


def render_index(contract_store, governance_store, product_store=None) -> str:
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
    body += (
        '<h2>Datasets with activity</h2>'
        '<p><a href="/ui/datasets">all datasets x latest verdict</a></p>'
    ) + (
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
    if product_store is not None:
        product_rows = [
            [
                f'<a href="/ui/products/{quote(pid, safe="")}">{escape(pid)}</a>',
                escape(", ".join(product_store.versions(pid))),
            ]
            for pid in product_store.list_ids()
        ]
        body += "<h2>Data products</h2>" + (
            _table(["product", "versions"], product_rows)
            if product_rows
            else "<p>(none)</p>"
        )
    body += (
        '<p><a href="/ui/author">author a new contract draft</a> · '
        '<a href="/ui/author-product">author a data product</a> · '
        '<a href="/ui/setup">setup bundle</a> · '
        '<a href="/ui/config">service configuration</a></p>'
    )
    return _PAGE.format(title="dc43 governance", body=body)


def render_contract(contract_store, contract_id: str) -> str | None:
    versions = contract_store.versions(contract_id)
    if not versions:
        return None
    sections = []
    cq = quote(contract_id, safe="")
    for i, version in enumerate(reversed(versions)):
        contract = contract_store.get(contract_id, version)
        if contract is None:
            continue
        prior_idx = len(versions) - 1 - i - 1
        links = (
            f'<a href="/ui/contracts/{cq}/{quote(version, safe="")}/edit">'
            "edit</a>"
        )
        if prior_idx >= 0:
            prev = versions[prior_idx]
            links += (
                f' · <a href="/ui/contracts/{cq}/diff?'
                f'from={quote(prev, safe="")}&to={quote(version, safe="")}">'
                f"diff vs {escape(prev)}</a>"
            )
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
            f" <small>({escape(contract.status)})</small>"
            f" <small>{links}</small></h2>"
            + (f"<p>servers: {servers}</p>" if servers else "")
            + _table(["field", "type", "flags", "quality rules"], field_rows)
        )
    return _PAGE.format(
        title=f"contract {escape(contract_id)}", body="".join(sections)
    )


# -- editing + version diff (r12 — the reference app's edit flow)


def render_edit_form(
    contract_store, contract_id: str, version: str,
    message: str | None = None, error: str | None = None,
) -> str | None:
    """``/ui/contracts/<id>/<v>/edit`` — the reference's edit form (ref
    contracts-app server.py ``edit_contract_form``: load the base
    version, pre-fill the editor, save as a NEW version). Documents are
    immutable here, so the save POSTs the editable sections as a
    ``changes`` overlay to the existing ``/workflow/contracts/<id>/<v>/
    edit`` route: a minor-bumped DRAFT that reaches governed reads only
    after review — the same split as authoring."""
    import json as _json

    base = contract_store.get(contract_id, version)
    if base is None:
        return None
    doc = base.to_dict()
    editable = {
        k: v for k, v in doc.items() if k not in ("id", "version", "status")
    }
    flash = ""
    if error:
        flash = f'<p class="block">{escape(error)}</p>'
    elif message:
        flash = f'<p class="ok">{escape(message)}</p>'
    cq = quote(contract_id, safe="")
    vq = quote(version, safe="")
    body = flash + (
        f"<p>editing <code>{escape(contract_id)}</code> : "
        f"<code>{escape(version)}</code> — the save creates a NEW "
        "minor-bumped <code>draft</code> version (documents are "
        "immutable); it reaches governed reads only after review.</p>"
        f'<form method="post" action="/workflow/contracts/{cq}/{vq}/edit">'
        "<p><label>editable document sections (JSON; id/version/status "
        "are managed by the workflow and cannot be overridden)<br>"
        f'<textarea name="changes" rows="24" cols="100">'
        f"{escape(_json.dumps(editable, indent=2, sort_keys=True))}"
        "</textarea></label></p>"
        '<p><label>author <input name="author" size="30"></label> '
        '<label>note <input name="note" size="50"></label></p>'
        '<p><button type="submit">Save as new draft version</button></p>'
        "</form>"
        f'<p><a href="/ui/contracts/{cq}">back to {escape(contract_id)}</a></p>'
    )
    return _PAGE.format(
        title=f"edit {escape(contract_id)} : {escape(version)}", body=body
    )


def _field_map(contract) -> dict:
    """(object, property) -> (type, flags, rules) for diffing."""
    out = {}
    for obj in contract.schema_objects:
        for prop in obj.properties:
            flags = ", ".join(
                flag
                for flag, on in (
                    ("required", prop.required),
                    ("unique", getattr(prop, "unique", False)),
                )
                if on
            )
            rules = "; ".join(
                r.rule + (f"={r.value!r}" if r.value is not None else "")
                for r in prop.quality
            )
            out[(obj.name, prop.name)] = (prop.physical_type, flags, rules)
    return out


def render_contract_diff(
    contract_store, contract_id: str, v_from: str, v_to: str
) -> str | None:
    """``/ui/contracts/<id>/diff?from=&to=`` — field-level diff between
    two stored versions (the reference editor's baseline-vs-edited diff,
    server-rendered): added / removed columns, per-column type / flags /
    quality-rule changes, plus description and status deltas."""
    a = contract_store.get(contract_id, v_from)
    b = contract_store.get(contract_id, v_to)
    if a is None or b is None:
        return None
    fa, fb = _field_map(a), _field_map(b)
    rows = []
    labels = ("type", "flags", "quality rules")
    for key in sorted(fa.keys() | fb.keys()):
        name = f"<code>{escape(key[0])}.{escape(key[1])}</code>"
        if key not in fa:
            t, fl, ru = fb[key]
            rows.append([name, '<span class="ok">added</span>',
                         "", escape(f"{t}" + (f" [{fl}]" if fl else "")
                                    + (f" {{{ru}}}" if ru else ""))])
        elif key not in fb:
            t, fl, ru = fa[key]
            rows.append([name, '<span class="block">removed</span>',
                         escape(f"{t}" + (f" [{fl}]" if fl else "")
                                + (f" {{{ru}}}" if ru else "")), ""])
        elif fa[key] != fb[key]:
            changed = ", ".join(
                lbl for lbl, x, y in zip(labels, fa[key], fb[key]) if x != y
            )
            rows.append([
                name,
                f'<span class="warn">changed ({escape(changed)})</span>',
                escape(" / ".join(x or "·" for x in fa[key])),
                escape(" / ".join(y or "·" for y in fb[key])),
            ])
    for label, x, y in (
        ("description", a.description, b.description),
        ("status", a.status, b.status),
    ):
        if (x or "") != (y or ""):
            rows.append([f"<i>{escape(label)}</i>",
                         '<span class="warn">changed</span>',
                         escape(str(x or "·")), escape(str(y or "·"))])
    body = (
        f"<p><code>{escape(v_from)}</code> → <code>{escape(v_to)}</code></p>"
        + (
            _table(["field", "change", escape(v_from), escape(v_to)], rows)
            if rows
            else "<p>(identical)</p>"
        )
        + f'<p><a href="/ui/contracts/{quote(contract_id, safe="")}">back</a></p>'
    )
    return _PAGE.format(
        title=f"diff {escape(contract_id)} {escape(v_from)}..{escape(v_to)}",
        body=body,
    )


def render_datasets_dashboard(governance_store) -> str:
    """All datasets x their LATEST verdict in one table — the reference
    app's landing surface (ref dc43-contracts-app server.py dataset
    routes) over the existing ``list_datasets`` / ``status_matrix`` /
    ``get_link`` store reads. Driver-side metadata only."""
    rows = []
    for ds in governance_store.list_datasets():
        matrix = governance_store.status_matrix(ds)
        latest = matrix[-1] if matrix else {}
        link = governance_store.get_link(ds) or {}
        violations = ""
        metrics = governance_store.load_metrics(
            ds, dataset_version=latest.get("dataset_version")
        )
        bad = [
            m for m in metrics
            if str(m.get("metric_key", "")).startswith("violations.")
            and (m.get("metric_numeric_value") or 0)
        ]
        if metrics:
            violations = f"{len(bad)} rule(s) violated" if bad else "clean"
        contract = ""
        if link.get("contract_id"):
            cid = str(link["contract_id"])
            contract = (
                f'<a href="/ui/contracts/{quote(cid, safe="")}">'
                f"{escape(cid)}</a> : "
                f"{escape(str(link.get('contract_version', '')))}"
            )
        rows.append([
            f'<a href="/ui/datasets/{quote(ds, safe="")}">{escape(ds)}</a>',
            escape(str(latest.get("dataset_version", ""))),
            _status_cell(latest.get("status", "")),
            contract,
            escape(violations),
            escape(str(len(matrix))),
        ])
    body = (
        _table(
            ["dataset", "latest version", "verdict", "contract",
             "latest metrics", "versions recorded"],
            rows,
        )
        if rows
        else "<p>(no datasets recorded)</p>"
    )
    return _PAGE.format(title="datasets", body=body)


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


# -- authoring (the write half: form -> ODCS document -> reviewable draft)

def form_to_document(fields: dict) -> dict:
    """The webui authoring form's urlencoded fields -> an ODCS-shaped
    contract document for ``workflow.author_draft``.

    ``columns`` is one ``name:type[:required][:unique]`` per line — the
    deliberately-small surface a human fills in a browser; anything
    richer (quality rules, servers) arrives via the JSON API instead.
    """
    contract_id = str(fields.get("contract_id", "")).strip()
    if not contract_id:
        raise ValueError("contract_id is required")
    lines = [
        ln.strip() for ln in str(fields.get("columns", "")).splitlines() if ln.strip()
    ]
    if not lines:
        raise ValueError("columns must list at least one 'name:type' line")
    props = []
    for ln in lines:
        parts = [p.strip() for p in ln.split(":")]
        if len(parts) < 2 or not parts[0] or not parts[1]:
            raise ValueError(f"column line must be 'name:type[:required]': {ln!r}")
        flags = {p.lower() for p in parts[2:]}
        unknown = flags - {"required", "unique"}
        if unknown:
            raise ValueError(f"unknown column flags {sorted(unknown)} in {ln!r}")
        prop: dict = {"name": parts[0], "physicalType": parts[1]}
        if "required" in flags:
            prop["required"] = True
        if "unique" in flags:
            prop["unique"] = True
        props.append(prop)
    doc: dict = {
        "id": contract_id,
        "schema": [
            {
                "name": str(fields.get("object", "")).strip()
                or contract_id.rsplit(".", 1)[-1],
                "properties": props,
            }
        ],
    }
    version = str(fields.get("version", "")).strip()
    if version:
        doc["version"] = version
    description = str(fields.get("description", "")).strip()
    if description:
        doc["description"] = description
    return doc


def render_author_form(message: str | None = None, error: str | None = None) -> str:
    """The contract authoring form (POSTs urlencoded to the existing
    /workflow/contracts route; bearer auth applies identically). Static
    markup except the flash line, which is escaped like everything else."""
    flash = ""
    if error:
        flash = f'<p class="block">{escape(error)}</p>'
    elif message:
        flash = f'<p class="ok">{escape(message)}</p>'
    body = flash + (
        '<form method="post" action="/workflow/contracts">'
        "<p><label>contract id<br>"
        '<input name="contract_id" size="40" placeholder="sales.orders"></label></p>'
        "<p><label>version (blank = auto draft version)<br>"
        '<input name="version" size="20" placeholder="1.0.0"></label></p>'
        "<p><label>columns, one <code>name:type[:required][:unique]</code> per line<br>"
        '<textarea name="columns" rows="8" cols="60" placeholder="o_orderkey:bigint:required:unique&#10;o_totalprice:decimal(15,2)"></textarea></label></p>'
        "<p><label>description<br>"
        '<input name="description" size="60"></label></p>'
        "<p><label>author<br>"
        '<input name="author" size="30"></label></p>'
        '<p><button type="submit">Create draft</button></p>'
        "</form>"
        "<p>The submission lands as a <code>draft</code>; it reaches governed "
        "reads only after approval on the review workflow.</p>"
    )
    return _PAGE.format(title="author a contract draft", body=body)


# ---------------- data products (ODPS)


def _port_lines_to_ports(raw: str, field_name: str) -> list[dict]:
    """``name:contract_id[:version]`` per line -> ODPS port dicts.
    Richer bindings (source-product ports, pins) arrive via the JSON
    API, same split as contract authoring."""
    ports = []
    for ln in (s.strip() for s in str(raw).splitlines()):
        if not ln:
            continue
        parts = [p.strip() for p in ln.split(":")]
        if len(parts) < 2 or not parts[0] or not parts[1]:
            raise ValueError(
                f"{field_name} line must be 'name:contract_id[:version]': {ln!r}"
            )
        port: dict = {"name": parts[0], "contractId": parts[1]}
        if len(parts) > 3:
            raise ValueError(f"too many ':' segments in {field_name} line {ln!r}")
        if len(parts) == 3 and parts[2]:
            port["version"] = parts[2]
        ports.append(port)
    return ports


def form_to_product(fields: dict) -> dict:
    """The product authoring form's urlencoded fields -> an ODPS-shaped
    product document (products/odps.py DataProduct.from_dict)."""
    product_id = str(fields.get("product_id", "")).strip()
    if not product_id:
        raise ValueError("product_id is required")
    outputs = _port_lines_to_ports(fields.get("output_ports", ""), "output_ports")
    inputs = _port_lines_to_ports(fields.get("input_ports", ""), "input_ports")
    if not outputs and not inputs:
        raise ValueError("at least one input or output port is required")
    doc: dict = {"id": product_id, "outputPorts": outputs, "inputPorts": inputs}
    version = str(fields.get("version", "")).strip()
    if version:
        doc["version"] = version
    status = str(fields.get("status", "")).strip()
    if status:
        doc["status"] = status
    return doc


def render_product_author_form(
    message: str | None = None, error: str | None = None
) -> str:
    """The product authoring form (POSTs urlencoded to /products)."""
    flash = ""
    if error:
        flash = f'<p class="block">{escape(error)}</p>'
    elif message:
        flash = f'<p class="ok">{escape(message)}</p>'
    body = flash + (
        '<form method="post" action="/products">'
        "<p><label>product id<br>"
        '<input name="product_id" size="40" placeholder="sales.analytics"></label></p>'
        "<p><label>version (blank = 0.1.0)<br>"
        '<input name="version" size="20" placeholder="0.1.0"></label></p>'
        "<p><label>output ports, one <code>name:contract_id[:version]</code> per line<br>"
        '<textarea name="output_ports" rows="4" cols="60" placeholder="gold:sales.orders:latest"></textarea></label></p>'
        "<p><label>input ports, one <code>name:contract_id[:version]</code> per line<br>"
        '<textarea name="input_ports" rows="4" cols="60"></textarea></label></p>'
        '<p><button type="submit">Create product</button></p>'
        "</form>"
        "<p>Ports must bind contracts the store already resolves; the "
        "registry refuses dangling bindings.</p>"
    )
    return _PAGE.format(title="author a data product", body=body)


def render_product_edit_form(
    product_store, product_id: str, version: str,
    message: str | None = None, error: str | None = None,
) -> str | None:
    """``/ui/products/<id>/<v>/edit`` — the reference's data-product
    edit page (ref contracts-app ``/data-products/{id}/{version}/edit``),
    mirroring the r12 contract-edit flow: documents are immutable, so
    the save POSTs the editable sections as a ``changes`` overlay to
    ``/products/<id>/<v>/edit``, which lands a version-bumped NEW
    document after port bindings revalidate."""
    import json as _json

    base = product_store.get(product_id, version)
    if base is None:
        return None
    doc = base.to_dict()
    editable = {
        k: v for k, v in doc.items()
        if k not in ("id", "version", "apiVersion", "kind")
    }
    flash = ""
    if error:
        flash = f'<p class="block">{escape(error)}</p>'
    elif message:
        flash = f'<p class="ok">{escape(message)}</p>'
    pq = quote(product_id, safe="")
    vq = quote(version, safe="")
    body = flash + (
        f"<p>editing product <code>{escape(product_id)}</code> : "
        f"<code>{escape(version)}</code> — the save creates a NEW "
        "version-bumped document (products are immutable per version); "
        "every port binding revalidates against the contract store "
        "before it lands.</p>"
        f'<form method="post" action="/products/{pq}/{vq}/edit">'
        "<p><label>editable document sections (JSON; id/version are "
        "managed and cannot be overridden)<br>"
        f'<textarea name="changes" rows="20" cols="100">'
        f"{escape(_json.dumps(editable, indent=2, sort_keys=True))}"
        "</textarea></label></p>"
        '<p><label>bump <select name="bump">'
        '<option value="minor">minor</option>'
        '<option value="major">major</option>'
        '<option value="patch">patch</option>'
        "</select></label></p>"
        '<p><button type="submit">Save as new version</button></p>'
        "</form>"
        f'<p><a href="/ui/products/{pq}">back to '
        f"{escape(product_id)}</a></p>"
    )
    return _PAGE.format(
        title=f"edit product {escape(product_id)} : {escape(version)}",
        body=body,
    )


def render_product(product_store, product_id: str) -> str | None:
    """One product's versions + port bindings."""
    versions = product_store.versions(product_id)
    if not versions:
        return None
    sections = []
    for v in versions:
        p = product_store.get(product_id, v)
        rows = [
            ["output", escape(port.name), escape(port.contract_id),
             escape(port.contract_version)]
            for port in p.output_ports
        ] + [
            ["input", escape(port.name),
             escape(port.contract_id or f"{port.source_product}#{port.source_port}"),
             escape(port.contract_version)]
            for port in p.input_ports
        ]
        pq = quote(product_id, safe="")
        vq = quote(v, safe="")
        sections.append(
            f"<h2>{escape(v)} <small>({escape(p.status)})</small> "
            f'<small><a href="/ui/products/{pq}/{vq}/edit">edit</a>'
            "</small></h2>"
            + _table(["kind", "port", "contract / source", "version"], rows)
        )
    return _PAGE.format(
        title=f"product {escape(product_id)}", body="".join(sections)
    )


def render_setup(params: dict[str, Any] | None = None) -> str:
    """``/ui/setup`` — the reference app's setup-bundle flow as one
    page (ref contracts-app renders stack-aware pipeline stubs from its
    config UI): pick the stack in the form, preview every generated
    file inline; the same selections drive
    ``governance.setup_bundle.write_setup_bundle`` programmatically."""
    from dc43_spark.governance.setup_bundle import (
        bundle_config_from_params,
        render_setup_bundle,
    )

    # the shared parser keeps this preview and /setup/export in lockstep
    try:
        cfg = bundle_config_from_params(params or {})
        files = render_setup_bundle(cfg)
        error = None
    except ValueError as exc:
        cfg = bundle_config_from_params({})
        files, error = {}, str(exc)

    def _select(name: str, options: tuple, current: str) -> str:
        opts = "".join(
            f'<option value="{escape(o)}"'
            f'{" selected" if o == current else ""}>{escape(o)}</option>'
            for o in options
        )
        return f'<label>{escape(name)} <select name="{escape(name)}">{opts}</select></label>'

    form = (
        '<form method="get" action="/ui/setup">'
        f'<p><label>project <input name="project" '
        f'value="{escape(cfg.project)}"></label> '
        + _select("integration", ("spark", "dlt"), cfg.integration)
        + " "
        + _select("format", ("parquet", "snaplog", "delta"),
                  cfg.table_format)
        + " "
        + _select("contract_store", ("memory", "filesystem", "sql"),
                  cfg.contract_store)
        + " "
        + _select("governance_store", ("memory", "filesystem", "sql"),
                  cfg.governance_store)
        + ' <button type="submit">render</button></p></form>'
    )
    body = form
    if error:
        body += f'<p class="block">{escape(error)}</p>'
    for name, content in sorted(files.items()):
        body += (
            f"<h2><code>{escape(name)}</code></h2>"
            f"<pre>{escape(content)}</pre>"
        )
    return _PAGE.format(title="setup bundle", body=body)


# -- service configuration (r12 — the reference app's config surface)

_STORE_KINDS = {
    # mirror of governance/bootstrap.py's builder dispatch (the builders
    # stay authoritative at boot; this is the validator's vocabulary)
    "contract_store": ("memory", "filesystem", "sql", "spark_table", "http"),
    "governance_store": ("memory", "filesystem", "sql", "spark_table", "http"),
    "product_store": ("memory", "filesystem", "sql", "spark_table", "collibra"),
}


def render_config(
    contract_store, governance_store, product_store=None,
    params: dict | None = None,
) -> str:
    """``/ui/config`` — the RUNNING service's store wiring (class names,
    read-only, tokens never rendered) plus a TOML VALIDATOR: paste a
    ``config.toml`` (the exact document governance/bootstrap.py loads)
    and see what it would build, without applying anything — the
    reference app's config-editor surface collapsed to its safe half
    (applying config means restarting the service that serves this
    page)."""
    import tomllib

    from dc43_spark.governance.bootstrap import parse_config

    rows = [
        [escape(kind), escape(type(store).__name__)]
        for kind, store in (
            ("contract store", contract_store),
            ("governance store", governance_store),
            ("product store", product_store),
        )
        if store is not None
    ]
    body = "<h2>Running stores</h2>" + _table(["role", "implementation"], rows)

    raw = ""
    if params:
        v = params.get("toml", [""])
        raw = v[0] if isinstance(v, list) else v
    report = ""
    if raw.strip():
        try:
            cfg = parse_config(tomllib.loads(raw))
        except (tomllib.TOMLDecodeError, TypeError) as exc:
            report = f'<p class="block">invalid TOML: {escape(str(exc))}</p>'
        else:
            out_rows, problems = [], []
            for section, kinds in _STORE_KINDS.items():
                sc = getattr(cfg, section)
                ok = (sc.type or "memory").lower() in kinds
                if not ok:
                    problems.append(
                        f"{section}.type {sc.type!r} is not one of {kinds}"
                    )
                detail = ", ".join(
                    f"{f}={getattr(sc, f)!r}"
                    for f in ("root", "dsn", "table", "base_url")
                    if getattr(sc, f)
                )
                out_rows.append([
                    escape(section),
                    escape(sc.type or "memory"),
                    escape(detail),
                    '<span class="ok">ok</span>' if ok
                    else '<span class="block">unknown type</span>',
                ])
            out_rows.append([
                "auth", "bearer" if cfg.auth.token else "none",
                "(token redacted)" if cfg.auth.token else "",
                '<span class="ok">ok</span>',
            ])
            out_rows.append([
                "service", "draft_on_block",
                escape(str(cfg.draft_on_block)), '<span class="ok">ok</span>',
            ])
            verdict = (
                '<p class="ok">config parses; these stores would build</p>'
                if not problems
                else '<p class="block">'
                + "; ".join(escape(p) for p in problems)
                + "</p>"
            )
            report = verdict + _table(
                ["section", "type", "settings", "check"], out_rows
            )
    # the echoed textarea masks token values: the GET query lands in
    # request logs already, but this page must never render a secret
    import re as _re

    echoed = _re.sub(
        r'(?m)^(\s*token\s*=\s*).*$', r'\1"***"', raw
    )
    body += (
        "<h2>Validate a config.toml</h2>"
        '<form method="get" action="/ui/config">'
        f'<p><textarea name="toml" rows="14" cols="90" '
        f'placeholder="[contract_store]&#10;type = &quot;filesystem&quot;'
        f'&#10;root = &quot;/srv/contracts&quot;">{escape(echoed)}</textarea>'
        "</p><p><button type='submit'>validate</button></p></form>"
        "<p>Validation only — the service loads its config at boot "
        "(<code>DC43_SERVICE_CONFIG</code> / bootstrap TOML); nothing "
        "is applied from this page.</p>"
    ) + report
    return _PAGE.format(title="service configuration", body=body)
