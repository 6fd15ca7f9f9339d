"""Dataset locator strategies: where a governed dataset physically lives.

Rebuilds the reference's resolution layer (dc43-integrations
spark/io/locators.py:63-548 — ContractFirstDatasetLocator,
StaticDatasetLocator, ContractVersionLocator) Spark-first:

- contract-first: the contract's ``servers`` entry is the default location;
- static overrides layer on top;
- version pinning resolves folder-per-version layouts (``<base>/<version>/``)
  with a ``latest`` alias and SemVer ordering, or emits Delta time-travel
  options (``versionAsOf`` / ``timestampAsOf``, ref locators.py:490-509);
- ``include_prior`` expands to a multi-path scan of all versions up to the
  pin (ref locators.py:314-488 list-of-paths loads).

Everything here is driver-side metadata work — the scan itself stays a
single declarative ``spark.read`` so Catalyst keeps pushdown/pruning.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field, replace
from typing import Optional, Protocol

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.versioning import SemVer


@dataclass
class DatasetResolution:
    """Physical location of one dataset version (ref ResolvedReadPlan)."""

    path: Optional[str] = None
    table: Optional[str] = None
    format: Optional[str] = None
    options: dict[str, str] = field(default_factory=dict)
    load_paths: Optional[list[str]] = None  # multi-path scan (folder versions)
    dataset_id: Optional[str] = None
    dataset_version: Optional[str] = None

    def __post_init__(self) -> None:
        if self.dataset_id is None:
            if self.table:
                self.dataset_id = f"table:{self.table}"
            elif self.path:
                self.dataset_id = f"path:{self.path}"


class DatasetLocator(Protocol):
    """Strategy protocol (ref spark/io/resolution.py:25-49)."""

    def for_read(self, contract: Optional[Contract], base: DatasetResolution) -> DatasetResolution:
        ...

    def for_write(self, contract: Optional[Contract], base: DatasetResolution) -> DatasetResolution:
        ...


class ContractFirstDatasetLocator:
    """Fill path/table/format/options from the contract's first server with a
    location (ref locators.py:63-140)."""

    def _resolve(self, contract: Optional[Contract], base: DatasetResolution) -> DatasetResolution:
        if base.path or base.table or contract is None:
            return base
        for server in contract.servers:
            if server.path or server.table:
                return replace(
                    base,
                    path=server.path,
                    table=server.table,
                    format=base.format or server.format,
                    options={**server.options, **base.options},
                    dataset_id=None,  # recompute from the new location
                )
        return base

    for_read = _resolve
    for_write = _resolve


class StaticDatasetLocator:
    """Fixed overrides, applied over whatever is already resolved
    (ref locators.py:143-257)."""

    def __init__(
        self,
        *,
        path: Optional[str] = None,
        table: Optional[str] = None,
        format: Optional[str] = None,
        options: Optional[dict[str, str]] = None,
        dataset_id: Optional[str] = None,
        dataset_version: Optional[str] = None,
    ) -> None:
        self._over = dict(
            path=path, table=table, format=format,
            dataset_id=dataset_id, dataset_version=dataset_version,
        )
        self._options = dict(options or {})

    def _resolve(self, contract: Optional[Contract], base: DatasetResolution) -> DatasetResolution:
        out = base
        updates = {k: v for k, v in self._over.items() if v is not None}
        if updates.get("path") or updates.get("table"):
            updates.setdefault("dataset_id", None)
        if updates:
            out = replace(out, **updates)
        if self._options:
            out = replace(out, options={**out.options, **self._options})
        return out

    for_read = _resolve
    for_write = _resolve


_VERSION_DIR = re.compile(r"^\d+\.\d+\.\d+$")
LATEST = "latest"


def list_folder_versions(base_path: str) -> list[str]:
    """SemVer-named subfolders of ``base_path``, ascending (ref
    locators.py:314-443 folder-version discovery)."""
    if not os.path.isdir(base_path):
        return []
    names = [
        n for n in os.listdir(base_path)
        if _VERSION_DIR.match(n) and os.path.isdir(os.path.join(base_path, n))
    ]
    return sorted(names, key=SemVer.parse)


def _is_instant(value: str) -> bool:
    """Is this pin an ISO-8601 instant (-> timestampAsOf) rather than a
    symbolic version name (-> tagAsOf on snaplog)?"""
    import datetime as _dt

    try:
        _dt.datetime.fromisoformat(value)
        return True
    except ValueError:
        return False


def delta_time_travel_options(
    *, version: Optional[int] = None, timestamp: Optional[str] = None
) -> dict[str, str]:
    """Reader options pinning a Delta table version (ref locators.py:490-509).

    Emitting options is pure metadata; the actual scan requires delta-spark
    on the cluster."""
    if (version is None) == (timestamp is None):
        raise ValueError("exactly one of version/timestamp must be given")
    if version is not None:
        return {"versionAsOf": str(version)}
    return {"timestampAsOf": str(timestamp)}


class ContractVersionLocator:
    """Pin a dataset version on top of a base locator (ref locators.py:261-548).

    - folder layout: ``<base>/<semver>/`` — ``latest`` resolves to the highest
      SemVer subfolder; ``include_prior`` loads every version <= the pin as a
      multi-path scan;
    - delta format: version pins become time-travel reader options (integer
      version or ISO timestamp).
    """

    def __init__(
        self,
        dataset_version: str,
        *,
        base: Optional[DatasetLocator] = None,
        include_prior: bool = False,
    ) -> None:
        self.dataset_version = dataset_version
        self.base = base or ContractFirstDatasetLocator()
        self.include_prior = include_prior

    def for_write(self, contract: Optional[Contract], base: DatasetResolution) -> DatasetResolution:
        out = self.base.for_write(contract, base)
        if out.path and (out.format or "parquet") not in ("delta", "snaplog"):
            version = self.dataset_version
            if version == LATEST:
                existing = list_folder_versions(out.path)
                version = existing[-1] if existing else "1.0.0"
            return replace(
                out,
                path=os.path.join(out.path, version),
                dataset_version=version,
                dataset_id=out.dataset_id,
            )
        return replace(out, dataset_version=self.dataset_version)

    def for_read(self, contract: Optional[Contract], base: DatasetResolution) -> DatasetResolution:
        out = self.base.for_read(contract, base)
        fmt = out.format or ("parquet" if out.path else None)
        if fmt == "delta" or fmt == "snaplog" or out.table:
            version = self.dataset_version
            if version == LATEST:
                return replace(out, dataset_version=version)
            if version.isdigit():
                opts = delta_time_travel_options(version=int(version))
            elif fmt == "snaplog" and not _is_instant(version):
                # snaplog: a symbolic dataset version (e.g. "1.2.0", the
                # shape governed writes TAG the table with) resolves as a
                # named ref — governance versions == table refs
                opts = {"tagAsOf": version}
            else:
                opts = delta_time_travel_options(timestamp=version)
            return replace(
                out, options={**out.options, **opts}, dataset_version=version
            )
        if not out.path:
            return replace(out, dataset_version=self.dataset_version)

        versions = list_folder_versions(out.path)
        if not versions:
            raise FileNotFoundError(
                f"no <semver>/ subfolders under {out.path} to resolve "
                f"version {self.dataset_version!r}"
            )
        version = versions[-1] if self.dataset_version == LATEST else self.dataset_version
        if version not in versions:
            raise FileNotFoundError(
                f"version {version!r} not found under {out.path}; have {versions}"
            )
        if self.include_prior:
            upto = versions[: versions.index(version) + 1]
            return replace(
                out,
                load_paths=[os.path.join(out.path, v) for v in upto],
                dataset_version=version,
            )
        return replace(
            out, path=os.path.join(out.path, version), dataset_version=version
        )
