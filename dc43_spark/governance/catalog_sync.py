"""Dataset↔contract link propagation into a table catalog (Unity Catalog).

Re-expresses the reference's Unity Catalog governance sync (ref:
dc43-service-backends governance/unity_catalog.py:63-365, hooked from
governance/backend/local.py:425-454) as a link hook for
:class:`~dc43_spark.governance.orchestrator.GovernanceService`:

- after every dataset↔contract link, resolve the catalog table(s) backing
  the dataset and stamp them with ``dc43.contract_id`` /
  ``dc43.contract_version`` / ``dc43.dataset_version`` properties and the
  equivalent governance tags;
- table targets come from the contract's ``servers`` entries (``table``
  fields) when a contract loader is wired, else from the dataset id via a
  ``table:`` prefix convention;
- the catalog client is injectable: :func:`spark_sql_catalog_client` binds
  to any Spark-attached catalog via ``ALTER TABLE ... SET TBLPROPERTIES``
  (on Databricks that IS Unity Catalog; OSS Spark applies the same
  statements to its session catalog, which is how the tests run it), and a
  fake client suffices for unit tests.

Semantics kept from the reference: the ``owner`` key is reserved and
dropped with a warning; tag keys containing characters UC rejects
(``. , - = / :``) are rewritten to ``_``; per-table catalog failures warn
and continue (a tagging outage must not fail the pipeline's governance
evaluation); duplicate/skip-listed tables are filtered case-insensitively.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Callable, Mapping, Optional, Protocol, Sequence

from dc43_spark.contracts.model import Contract

# keys the catalog owns; stamping them would change table ownership
RESERVED_KEYS = frozenset({"owner"})
# characters Unity Catalog rejects in tag keys
TAG_KEY_BAD_CHARS = ".,-=/:"


class CatalogTagClient(Protocol):
    """Minimal surface a catalog binding must provide."""

    def set_properties(self, table: str, properties: Mapping[str, str]) -> None: ...

    def set_tags(
        self, table: str, tags: Mapping[str, str], unset: Sequence[str] = ()
    ) -> None: ...


def prefix_table_resolver(prefix: str = "table:") -> Callable[[str], Optional[str]]:
    """Dataset-id -> table-name resolver for ids like ``table:cat.sch.tbl``.

    Ids without the prefix resolve to None (path-based datasets have no
    catalog table to tag). An empty prefix passes ids through unchanged."""

    def resolve(dataset_id: str) -> Optional[str]:
        if not prefix:
            return dataset_id
        if dataset_id.startswith(prefix):
            return dataset_id[len(prefix):] or None
        return None

    return resolve


def contract_server_tables(contract: Contract) -> tuple[str, ...]:
    """Catalog tables named by the contract's server descriptors."""
    out: list[str] = []
    seen: set[str] = set()
    for server in contract.servers:
        if not server.table:
            continue
        key = server.table.replace("`", "").strip().lower()
        if not key or key in seen:
            continue
        seen.add(key)
        out.append(server.table)
    return tuple(out)


def normalize_tag_key(key: str) -> Optional[str]:
    """UC-safe tag key, or None if empty/reserved. Bad chars -> ``_``."""
    text = str(key).strip()
    if not text:
        return None
    cleaned = "".join("_" if c in TAG_KEY_BAD_CHARS else c for c in text)
    if cleaned != text:
        warnings.warn(
            f"catalog tag key {text!r} contains reserved characters; using {cleaned!r}",
            RuntimeWarning,
            stacklevel=3,
        )
    if not cleaned or cleaned.lower() in RESERVED_KEYS:
        if cleaned:
            warnings.warn(
                f"catalog tag key {text!r} is reserved; dropped", RuntimeWarning, stacklevel=3
            )
        return None
    return cleaned


def _clean_properties(raw: Mapping[str, object]) -> dict[str, str]:
    out: dict[str, str] = {}
    for key, value in raw.items():
        text = str(key).strip()
        if not text or value is None:
            continue
        if text.lower() in RESERVED_KEYS:
            warnings.warn(
                f"catalog property {text!r} is reserved; dropped", RuntimeWarning, stacklevel=3
            )
            continue
        out[text] = str(value)
    return out


@dataclass
class UnityCatalogLinkHook:
    """Link hook stamping contract linkage onto catalog tables.

    Call shape matches ``GovernanceService.link_hooks``:
    ``hook(dataset_id, dataset_version, contract_id, contract_version)``.
    """

    client: CatalogTagClient
    table_resolver: Callable[[str], Optional[str]] = field(
        default_factory=prefix_table_resolver
    )
    contract_loader: Optional[Callable[[str, str], Optional[Contract]]] = None
    static_properties: Mapping[str, str] = field(default_factory=dict)
    static_tags: Mapping[str, str] = field(default_factory=dict)
    skip_tables: frozenset[str] = frozenset()

    def __call__(
        self,
        dataset_id: str,
        dataset_version: str,
        contract_id: str,
        contract_version: str,
    ) -> None:
        targets = self._targets(dataset_id, contract_id, contract_version)
        if not targets:
            return
        metadata: dict[str, object] = {
            "dc43.contract_id": contract_id,
            "dc43.contract_version": contract_version,
        }
        if dataset_version:
            metadata["dc43.dataset_version"] = dataset_version
        properties = _clean_properties({**self.static_properties, **metadata})
        # default keys are dotted for the *property* namespace; tags get the
        # pre-sanitized form directly so the normalizer only warns on
        # user-supplied static_tags that genuinely need rewriting
        tag_metadata = {k.replace(".", "_"): v for k, v in metadata.items()}
        tags: dict[str, str] = {}
        for key, value in {**self.static_tags, **tag_metadata}.items():
            safe = normalize_tag_key(key)
            if safe is not None and value is not None:
                tags[safe] = str(value)
        for table in targets:
            try:
                self.client.set_properties(table, properties)
            except Exception as exc:  # noqa: BLE001 — catalog outage must not fail eval
                warnings.warn(
                    f"catalog property sync failed for {table!r}: {exc}",
                    RuntimeWarning,
                    stacklevel=2,
                )
            try:
                self.client.set_tags(table, tags)
            except Exception as exc:  # noqa: BLE001
                warnings.warn(
                    f"catalog tag sync failed for {table!r}: {exc}",
                    RuntimeWarning,
                    stacklevel=2,
                )

    def _targets(
        self, dataset_id: str, contract_id: str, contract_version: str
    ) -> list[str]:
        tables: list[str] = []
        if self.contract_loader is not None:
            contract = None
            try:
                contract = self.contract_loader(contract_id, contract_version)
            except Exception as exc:  # noqa: BLE001
                warnings.warn(
                    f"could not load contract {contract_id}:{contract_version}: {exc}",
                    RuntimeWarning,
                    stacklevel=2,
                )
            if contract is not None:
                tables.extend(contract_server_tables(contract))
        if not tables:
            resolved = self.table_resolver(dataset_id)
            if resolved:
                tables.append(resolved)
        skip = {t.lower() for t in self.skip_tables}
        out: list[str] = []
        seen: set[str] = set()
        for table in tables:
            key = table.replace("`", "").strip().lower()
            if not key or key in seen:
                continue
            if key in skip:
                warnings.warn(
                    f"catalog sync skipped reserved table {table!r}",
                    RuntimeWarning,
                    stacklevel=2,
                )
                continue
            seen.add(key)
            out.append(table)
        return out


def _quote_table(table: str) -> str:
    parts = [p.strip() for p in table.split(".") if p.strip()]
    if not parts:
        raise ValueError("empty table identifier")
    return ".".join("`" + p.replace("`", "``") + "`" for p in parts)


def _quote_value(value: str) -> str:
    return value.replace("'", "''")


@dataclass
class SparkSqlCatalogClient:
    """Catalog binding via Spark SQL DDL.

    ``set_properties`` issues ``ALTER TABLE ... SET TBLPROPERTIES`` — on
    Databricks that lands in Unity Catalog; on OSS Spark it lands in the
    session catalog (Hive/in-memory), which makes the binding testable here.
    ``set_tags`` uses UC's ``SET TAGS`` DDL when ``uc_tag_ddl=True``; OSS
    Spark has no tag DDL, so the default encodes tags as ``dc43.tag.<key>``
    table properties (round-trippable via DESCRIBE/catalog APIs)."""

    spark: object  # SparkSession — untyped to keep import light
    uc_tag_ddl: bool = False
    tag_property_prefix: str = "dc43.tag."

    def set_properties(self, table: str, properties: Mapping[str, str]) -> None:
        if not properties:
            return
        assignments = ", ".join(
            f"'{_quote_value(k)}'='{_quote_value(v)}'" for k, v in sorted(properties.items())
        )
        self.spark.sql(f"ALTER TABLE {_quote_table(table)} SET TBLPROPERTIES ({assignments})")

    def set_tags(
        self, table: str, tags: Mapping[str, str], unset: Sequence[str] = ()
    ) -> None:
        ident = _quote_table(table)
        if self.uc_tag_ddl:
            if tags:
                body = ", ".join(
                    f"'{_quote_value(k)}'='{_quote_value(v)}'" for k, v in sorted(tags.items())
                )
                self.spark.sql(f"ALTER TABLE {ident} SET TAGS ({body})")
            if unset:
                body = ", ".join(f"'{_quote_value(k)}'" for k in sorted(unset))
                self.spark.sql(f"ALTER TABLE {ident} UNSET TAGS ({body})")
            return
        props = {self.tag_property_prefix + k: v for k, v in tags.items()}
        if props:
            self.set_properties(table, props)
        if unset:
            body = ", ".join(
                f"'{_quote_value(self.tag_property_prefix + k)}'" for k in sorted(unset)
            )
            self.spark.sql(f"ALTER TABLE {ident} UNSET TBLPROPERTIES IF EXISTS ({body})")
