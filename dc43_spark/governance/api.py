"""JSON API for programmatic consumers (ref contracts-app
server.py:7652-7917 ``/api/*`` routes): pure serialization over the
stores, so the HTTP layer (governance/server.py) stays routing-only and
every payload is unit-testable without a socket.

Surface mirrored from the reference:

  GET  /api/contracts                          -> contract catalog
  GET  /api/contracts/{cid}/{ver}              -> contract + linked
                                                  datasets + expectations
  POST /api/contracts/{cid}/{ver}/validate     -> {"status": ...}
  GET  /api/datasets                           -> dataset records
  GET  /api/datasets/{dataset_id}              -> record + contract +
                                                  expectations
  GET  /api/integration-helper/contracts       -> helper catalog
  GET  /api/integration-helper/data-products   -> product catalog
  GET  /api/integration-helper/contracts/{cid}/{ver}
  GET  /api/integration-helper/data-products/{pid}/{ver}
  POST /api/integration-helper/stub            -> runnable Spark snippet

The stub generator follows the setup-bundle precedent
(governance/setup_bundle.py): the emitted script is a RUNNABLE governed
pipeline against a ``config.toml`` — inputs resolve + read through
``read_with_contract`` (seeded synthetically when the feed doesn't
exist yet), a ``transform()`` hook awaits the business logic, outputs
write through ``write_with_contract`` and land a persisted governed
verdict. tests/test_api.py EXECUTES an emitted stub end to end.
"""

from __future__ import annotations

from typing import Any, Optional

from dc43_spark.contracts.model import Contract
from dc43_spark.expectations.compiler import expectation_plan


# ---------------- contracts


def _contract_summary(contract: Contract) -> dict[str, Any]:
    return {
        "id": contract.id,
        "version": contract.version,
        "status": contract.status,
        "description": contract.description,
        "objects": [o.name for o in contract.schema_objects],
        "field_count": sum(
            len(o.properties) for o in contract.schema_objects
        ),
    }


def contract_catalog(contract_store) -> list[dict[str, Any]]:
    """One row per contract id: versions plus the newest version's
    summary (the reference's ``load_contract_meta`` shape)."""
    out = []
    for cid in contract_store.list_ids():
        versions = contract_store.versions(cid)
        latest = contract_store.get(cid, versions[-1]) if versions else None
        row: dict[str, Any] = {"id": cid, "versions": versions}
        if latest is not None:
            row.update(_contract_summary(latest))
        out.append(row)
    return out


def _linked_datasets(governance_store, cid: str, ver: str) -> list[dict]:
    datasets = getattr(governance_store, "list_datasets", lambda: [])()
    rows = []
    for ds in datasets:
        link = governance_store.get_link(ds)
        if not link or link.get("contract_id") != cid:
            continue
        if ver and link.get("contract_version") not in (ver, None):
            continue
        rows.append({"dataset_id": ds, **link,
                     "matrix": governance_store.status_matrix(ds)})
    return rows


def contract_detail(
    contract_store, governance_store, cid: str, ver: str
) -> Optional[dict[str, Any]]:
    """Contract JSON + datasets linked to it + the compiled expectation
    plan (ref ``api_contract_detail``); None when absent -> 404."""
    contract = contract_store.get(cid, ver)
    if contract is None:
        return None
    return {
        "contract": contract.to_dict(),
        "summary": _contract_summary(contract),
        "datasets": _linked_datasets(governance_store, cid, ver),
        "expectations": expectation_plan(contract),
    }


class PreviewUnavailable(RuntimeError):
    """No SparkSession is wired into the service — the HTTP tier maps
    this to 503 (the ref's "pyspark is required for data previews")."""


def contract_preview(
    contract_store,
    governance_store,
    spark,
    cid: str,
    ver: str,
    *,
    limit: int = 100,
    dataset_version: Optional[str] = None,
) -> Optional[dict[str, Any]]:
    """Governed sample-row preview (ref contracts-app server.py:7673-7775
    ``api_contract_preview``): rows come through ``read_with_contract``
    under the contract's own server binding — the SAME read path a
    pipeline uses, so the preview shows contract-aligned columns — with
    enforcement off (a preview must render even for a violating
    dataset) and metrics off (no observation pass for a 100-row peek).
    ``limit`` clamps to the ref's 1..500; ``dataset_version`` pins a
    folder/tag/time-travel version via ContractVersionLocator. Returns
    None for an unknown contract (404); raises ``PreviewUnavailable``
    when no SparkSession is wired (503)."""
    contract = contract_store.get(cid, ver)
    if contract is None:
        return None
    if spark is None:
        raise PreviewUnavailable(
            "no SparkSession is wired into this service; previews need "
            "GovernanceServiceServer(spark_session=...)"
        )
    from dc43_spark.io.locators import ContractVersionLocator
    from dc43_spark.io.read import read_with_contract

    limit = max(1, min(int(limit), 500))
    locator = (
        ContractVersionLocator(dataset_version)
        if dataset_version is not None
        else None
    )
    df, result = read_with_contract(
        spark, contract,
        enforce=False, auto_cast=False, metrics=False, locator=locator,
    )
    rows = [r.asDict(recursive=True) for r in df.limit(limit).collect()]
    dataset_id = contract.id or cid
    selected = dataset_version or "latest"
    status = governance_store.load_status(dataset_id, selected)
    return {
        "dataset_id": dataset_id,
        "dataset_version": selected,
        "rows": rows,
        "columns": list(df.columns),
        "limit": limit,
        "status": status or {"status": "unknown"},
        "validation": {"ok": result.ok, "errors": result.errors},
    }


def validate_contract(contract_store, cid: str, ver: str) -> Optional[dict]:
    """Ref ``api_validate_contract``: the stored document's status (the
    reference returns a static "active"; here the answer is real)."""
    contract = contract_store.get(cid, ver)
    if contract is None:
        return None
    return {"status": contract.status}


# ---------------- datasets


def dataset_catalog(governance_store) -> list[dict[str, Any]]:
    """One record per (dataset, recorded version) with its status and
    the dataset's contract link (ref ``api_datasets``' DQ records)."""
    out = []
    for ds in getattr(governance_store, "list_datasets", lambda: [])():
        link = governance_store.get_link(ds) or {}
        for row in governance_store.status_matrix(ds):
            out.append({"dataset_id": ds, **row, **link})
    return out


def dataset_detail(
    governance_store, contract_store, dataset_id: str
) -> Optional[dict[str, Any]]:
    """Link + status matrix + activity + the linked contract's document
    and expectations (ref ``api_dataset_detail``)."""
    link = governance_store.get_link(dataset_id)
    matrix = governance_store.status_matrix(dataset_id)
    activity = governance_store.activity(dataset_id)
    if not (link or matrix or activity):
        return None
    out: dict[str, Any] = {
        "dataset_id": dataset_id,
        "link": link,
        "matrix": matrix,
        "activity": activity,
    }
    if link:
        contract = contract_store.get(
            link["contract_id"], link["contract_version"]
        )
        if contract is not None:
            out["contract"] = contract.to_dict()
            out["expectations"] = expectation_plan(contract)
    return out


# ---------------- products


def product_catalog(product_store) -> list[dict[str, Any]]:
    out = []
    for pid in product_store.list_ids():
        versions = product_store.versions(pid)
        latest = product_store.get(pid, versions[-1]) if versions else None
        row: dict[str, Any] = {"id": pid, "versions": versions}
        if latest is not None:
            row.update({
                "version": latest.version,
                "status": latest.status,
                "input_ports": [p.name for p in latest.input_ports],
                "output_ports": [p.name for p in latest.output_ports],
            })
        out.append(row)
    return out


def product_detail(product_store, pid: str, ver: str) -> Optional[dict]:
    product = product_store.get(pid, ver)
    if product is None:
        return None
    return {"data_product": product.to_dict()}


# ---------------- integration-helper stub

_STUB = '''\
#!/usr/bin/env python
"""Governed Spark integration for {title} — generated by the
dc43_spark integration helper (ref contracts-app
``POST /api/integration-helper/stub``). Run next to a setup-bundle
``config.toml``: ``python integration.py``."""

import os

from dc43_spark.governance.bootstrap import (
    build_contract_store,
    build_governance_store,
    load_config,
)
from dc43_spark.governance.orchestrator import GovernanceService
from dc43_spark.io.read import read_with_contract
from dc43_spark.io.write import write_with_contract
from dc43_spark.session import governed_session
from dc43_spark.testing import synthetic_dataframe

INPUTS = {inputs!r}   # (contract_id, SemVer selector)
OUTPUTS = {outputs!r}
FORMAT = {fmt!r}


def transform(inputs):
    """Replace with your business logic. ``inputs`` maps contract id ->
    governed DataFrame; return ``{{output_contract_id: DataFrame}}``.
    Any output you leave out is seeded synthetically from its contract
    so the scaffold runs end to end before the real logic lands."""
    return {{}}


def main() -> dict:
    spark = governed_session({project!r})
    cfg = load_config("config.toml")
    store = build_contract_store(cfg.contract_store, spark=spark)
    service = GovernanceService(
        contract_store=store,
        store=build_governance_store(cfg.governance_store, spark=spark),
        draft_on_block=cfg.draft_on_block,
    )
    root = os.path.dirname(os.path.abspath(__file__))

    frames = {{}}
    for cid, selector in INPUTS:
        contract = store.resolve(cid, selector)
        if contract is None:
            raise LookupError(f"input contract {{cid}}:{{selector}} not in store")
        path = os.path.join(root, "data", cid)
        if not os.path.isdir(path):
            # seed so the scaffold is runnable before the real feed lands
            write_with_contract(
                synthetic_dataframe(spark, contract, n_rows=40), contract,
                path=path, format=FORMAT, mode="overwrite",
            )
        df, _status = read_with_contract(
            spark, contract, path=path, format=FORMAT
        )
        frames[cid] = df

    produced = transform(frames)
    verdicts = {{}}
    for cid, selector in OUTPUTS:
        contract = store.resolve(cid, selector)
        if contract is None:
            raise LookupError(f"output contract {{cid}}:{{selector}} not in store")
        df_out = produced.get(cid)
        if df_out is None:
            df_out = synthetic_dataframe(spark, contract, n_rows=40)
        target = os.path.join(root, "data", cid)
        write_with_contract(
            df_out, contract, path=target, format=FORMAT, mode="overwrite"
        )
        aligned, _ = read_with_contract(
            spark, contract, path=target, format=FORMAT
        )
        outcome = service.evaluate_dataset(
            aligned, contract, dataset_id=target, dataset_version="latest",
            operation="read", pipeline={project!r},
        )
        verdicts[cid] = outcome.validation.status
    print(verdicts)
    return verdicts


if __name__ == "__main__":
    main()
'''

_FORMATS = ("parquet", "snaplog", "delta")


def _selection(entries) -> list[tuple[str, str]]:
    out = []
    for e in entries:
        if isinstance(e, dict):
            cid = str(e.get("contract_id") or e.get("id") or "").strip()
            ver = str(e.get("version") or "latest").strip()
        else:
            cid, ver = str(e[0]), str(e[1] if len(e) > 1 else "latest")
        if not cid:
            raise ValueError("selection entry is missing contract_id")
        # an exact version becomes an exact SemVer selector
        selector = ver if ver == "latest" or ver[0] in "=><" else f"=={ver}"
        out.append((cid, selector))
    return out


def integration_stub(
    contract_store,
    inputs,
    outputs,
    *,
    fmt: str = "parquet",
    project: str = "dc43-integration",
) -> dict[str, Any]:
    """The reference's ``POST /api/integration-helper/stub`` payload:
    validate the selection against the store, then render the runnable
    script. Raises ``ValueError`` on an invalid selection (the route
    maps it to 400/422)."""
    if fmt not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, not {fmt!r}")
    ins, outs = _selection(inputs), _selection(outputs)
    if not ins:
        raise ValueError("at least one input contract is required")
    if not outs:
        raise ValueError("at least one output contract is required")
    summaries: dict[str, list] = {"inputs": [], "outputs": []}
    for side, pairs in (("inputs", ins), ("outputs", outs)):
        for cid, selector in pairs:
            contract = contract_store.resolve(cid, selector)
            if contract is None:
                raise LookupError(f"unknown contract {cid} {selector}")
            summaries[side].append(_contract_summary(contract))
    title = " + ".join(dict.fromkeys(c for c, _ in ins + outs))
    return {
        "integration": "spark",
        "stub": _STUB.format(
            title=title, inputs=ins, outputs=outs, fmt=fmt, project=project
        ),
        "contracts": summaries,
    }
