"""Declarative service wiring from TOML + environment.

ref: dc43-service-backends config.py (TOML-file + ``DC43_*`` env-override
layering into typed store configs) and bootstrap.py:1-537 (building the
concrete stores/backends from that config). Collapsed to the engine's
needs: one config dataclass per store, one loader with env overrides, and
builders producing ready ``GovernanceService`` / ``GovernanceServiceServer``
objects. Auth follows ref auth.py:28-76 — a bearer token protecting every
service route.

TOML shape::

    [contract_store]
    type = "filesystem"          # memory | filesystem | sql | spark_table | http
    root = "/governance/contracts"

    [governance_store]
    type = "sql"
    dsn = "/governance/governance.db"

    [auth]
    token = "s3cret"

    [service]
    draft_on_block = true

Environment overrides (highest precedence, mirroring the reference's
variable names): ``DC43_CONTRACT_STORE_TYPE``, ``DC43_CONTRACT_STORE``
(root/path), ``DC43_CONTRACT_STORE_DSN``, ``DC43_CONTRACT_STORE_TABLE``,
the same four with ``GOVERNANCE`` in place of ``CONTRACT``, and
``DC43_BACKEND_TOKEN``. ``DC43_SERVICE_CONFIG`` names the TOML file when
no explicit path is passed.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, field
from typing import Any, Mapping, Optional

from dc43_spark.contracts.store import (
    ContractStore,
    FSContractStore,
    MemoryContractStore,
    SparkTableContractStore,
)
from dc43_spark.governance.orchestrator import GovernanceService
from dc43_spark.governance.server import GovernanceServiceServer
from dc43_spark.governance.stores import (
    FSGovernanceStore,
    GovernanceStore,
    MemoryGovernanceStore,
    SparkTableGovernanceStore,
)


@dataclass
class StoreConfig:
    type: str = "memory"
    root: Optional[str] = None
    dsn: Optional[str] = None
    table: Optional[str] = None
    base_url: Optional[str] = None
    token: Optional[str] = None
    timeout: float = 10.0

    @classmethod
    def from_mapping(cls, data: Mapping[str, Any]) -> "StoreConfig":
        return cls(**{k: v for k, v in data.items() if k in cls.__dataclass_fields__})


@dataclass
class AuthConfig:
    token: Optional[str] = None


@dataclass
class ServiceConfig:
    contract_store: StoreConfig = field(default_factory=StoreConfig)
    governance_store: StoreConfig = field(default_factory=StoreConfig)
    product_store: StoreConfig = field(default_factory=StoreConfig)
    auth: AuthConfig = field(default_factory=AuthConfig)
    draft_on_block: bool = False


def parse_config(data: Mapping[str, Any]) -> ServiceConfig:
    """A parsed TOML mapping -> ServiceConfig (the document half of
    ``load_config``, without file IO or env overrides — the /ui/config
    validator reuses it on pasted text)."""
    return ServiceConfig(
        contract_store=StoreConfig.from_mapping(data.get("contract_store", {})),
        governance_store=StoreConfig.from_mapping(data.get("governance_store", {})),
        product_store=StoreConfig.from_mapping(data.get("product_store", {})),
        auth=AuthConfig(token=(data.get("auth", {}) or {}).get("token")),
        draft_on_block=bool((data.get("service", {}) or {}).get("draft_on_block", False)),
    )


def load_config(
    path: Optional[str] = None, *, env: Mapping[str, str] | None = None
) -> ServiceConfig:
    """Layered config: TOML file (explicit path, else ``DC43_SERVICE_CONFIG``)
    overridden by ``DC43_*`` environment variables."""
    env = os.environ if env is None else env
    path = path or env.get("DC43_SERVICE_CONFIG")
    data: dict[str, Any] = {}
    if path:
        with open(path, "rb") as fh:
            data = tomllib.load(fh)
    cfg = parse_config(data)
    for store, prefix in (
        (cfg.contract_store, "DC43_CONTRACT_STORE"),
        (cfg.governance_store, "DC43_GOVERNANCE_STORE"),
        (cfg.product_store, "DC43_DATA_PRODUCT_STORE"),
    ):
        if env.get(f"{prefix}_TYPE"):
            store.type = env[f"{prefix}_TYPE"]
        if env.get(prefix):
            store.root = env[prefix]
        if env.get(f"{prefix}_DSN"):
            store.dsn = env[f"{prefix}_DSN"]
        if env.get(f"{prefix}_TABLE"):
            store.table = env[f"{prefix}_TABLE"]
    if env.get("DC43_BACKEND_TOKEN"):
        cfg.auth.token = env["DC43_BACKEND_TOKEN"]
    return cfg


def build_contract_store(cfg: StoreConfig, *, spark=None) -> ContractStore:
    kind = (cfg.type or "memory").lower()
    if kind == "memory":
        return MemoryContractStore()
    if kind == "filesystem":
        if not cfg.root:
            raise ValueError("filesystem contract store needs root=")
        return FSContractStore(cfg.root)
    if kind == "sql":
        from dc43_spark.contracts.sql_store import SQLContractStore

        return SQLContractStore(cfg.dsn or ":memory:")
    if kind == "spark_table":
        if spark is None or not cfg.table:
            raise ValueError("spark_table contract store needs spark= and table=")
        return SparkTableContractStore(spark, cfg.table)
    if kind == "http":
        from dc43_spark.contracts.http_store import HTTPContractStore, urllib_transport

        if not cfg.base_url:
            raise ValueError("http contract store needs base_url=")
        return HTTPContractStore(
            urllib_transport(cfg.base_url, timeout=cfg.timeout, token=cfg.token)
        )
    raise ValueError(f"unknown contract store type {cfg.type!r}")


def build_governance_store(cfg: StoreConfig, *, spark=None) -> GovernanceStore:
    kind = (cfg.type or "memory").lower()
    if kind == "memory":
        return MemoryGovernanceStore()
    if kind == "filesystem":
        if not cfg.root:
            raise ValueError("filesystem governance store needs root=")
        return FSGovernanceStore(cfg.root)
    if kind == "sql":
        from dc43_spark.contracts.sql_store import SQLGovernanceStore

        return SQLGovernanceStore(cfg.dsn or ":memory:")
    if kind == "spark_table":
        if spark is None or not cfg.table:
            raise ValueError("spark_table governance store needs spark= and table=")
        return SparkTableGovernanceStore(spark, cfg.table)
    if kind == "http":
        from dc43_spark.contracts.http_store import urllib_transport
        from dc43_spark.governance.server import HTTPGovernanceStore

        if not cfg.base_url:
            raise ValueError("http governance store needs base_url=")
        return HTTPGovernanceStore(
            urllib_transport(cfg.base_url, timeout=cfg.timeout, token=cfg.token)
        )
    raise ValueError(f"unknown governance store type {cfg.type!r}")


def build_product_store(cfg: StoreConfig, *, spark=None):
    from dc43_spark.products.store import (
        FSProductStore,
        MemoryProductStore,
        SparkTableProductStore,
        SQLProductStore,
    )

    kind = (cfg.type or "memory").lower()
    if kind == "memory":
        return MemoryProductStore()
    if kind == "filesystem":
        if not cfg.root:
            raise ValueError("filesystem product store needs root=")
        return FSProductStore(cfg.root)
    if kind == "sql":
        return SQLProductStore(cfg.dsn or ":memory:")
    if kind == "spark_table":
        if spark is None or not cfg.table:
            raise ValueError("spark_table product store needs spark= and table=")
        return SparkTableProductStore(spark, cfg.table)
    if kind == "collibra":
        from dc43_spark.contracts.http_store import urllib_transport
        from dc43_spark.products.collibra import (
            CollibraProductStore,
            HttpCollibraProductAdapter,
        )

        if not cfg.base_url:
            raise ValueError("collibra product store needs base_url=")
        return CollibraProductStore(
            HttpCollibraProductAdapter(
                urllib_transport(cfg.base_url, timeout=cfg.timeout, token=cfg.token)
            )
        )
    raise ValueError(f"unknown product store type {cfg.type!r}")


def build_registry(cfg: ServiceConfig, *, spark=None):
    """A ready ProductRegistry (port-bound governed IO) from config."""
    from dc43_spark.products.odps import ProductRegistry

    return ProductRegistry(
        build_contract_store(cfg.contract_store, spark=spark),
        build_product_store(cfg.product_store, spark=spark),
    )


def build_service(cfg: ServiceConfig, *, spark=None) -> GovernanceService:
    """A ready in-process governance backend from declarative config."""
    return GovernanceService(
        contract_store=build_contract_store(cfg.contract_store, spark=spark),
        store=build_governance_store(cfg.governance_store, spark=spark),
        draft_on_block=cfg.draft_on_block,
    )


def build_server(cfg: ServiceConfig, *, spark=None, host: str = "127.0.0.1", port: int = 0) -> GovernanceServiceServer:
    """A ready socket service from declarative config, bearer-protected
    when ``[auth] token`` (or ``DC43_BACKEND_TOKEN``) is set."""
    return GovernanceServiceServer(
        build_contract_store(cfg.contract_store, spark=spark),
        build_governance_store(cfg.governance_store, spark=spark),
        host=host,
        port=port,
        auth_token=cfg.auth.token,
    )
