"""ODPS-lite data products: input/output ports binding contracts.

ref: dc43-service-clients odps.py:134-267 (``OpenDataProductStandard`` with
ports binding name/version/contractId) and governance/backend/local.py
:1279-1366 (input bindings resolve to the producer's output-port contract).
Driver-side metadata only — no Spark involvement.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.store import ContractStore


@dataclass
class Port:
    """A product port. Output ports always bind a contract directly. An
    input port may instead (or additionally) reference the PRODUCER's
    output port via ``source_product``/``source_port`` — resolution then
    follows the producer's binding, so a consumer tracks the producer's
    contract upgrades without re-declaring them (ref local.py:1279-1366).
    ``source_contract_version`` optionally pins the resolved version
    (``1.2.0`` or ``==1.2.0``); a mismatch is an error, not a silent
    downgrade."""

    name: str
    contract_id: str = ""
    contract_version: str = "latest"  # selector: ==x.y.z / >=x.y.z / latest
    description: Optional[str] = None
    source_product: Optional[str] = None
    source_port: Optional[str] = None
    source_contract_version: Optional[str] = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "contractId": self.contract_id,
            "version": self.contract_version,
            **({"description": self.description} if self.description else {}),
            **({"sourceDataProduct": self.source_product} if self.source_product else {}),
            **({"sourceOutputPort": self.source_port} if self.source_port else {}),
            **(
                {"sourceContractVersion": self.source_contract_version}
                if self.source_contract_version
                else {}
            ),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Port":
        return cls(
            name=d["name"],
            contract_id=d.get("contractId", d.get("contract_id", "")),
            contract_version=d.get("version", "latest"),
            description=d.get("description"),
            source_product=d.get("sourceDataProduct", d.get("source_product")),
            source_port=d.get("sourceOutputPort", d.get("source_port")),
            source_contract_version=d.get(
                "sourceContractVersion", d.get("source_contract_version")
            ),
        )


@dataclass
class DataProduct:
    id: str
    version: str = "0.1.0"
    status: str = "active"
    input_ports: list[Port] = field(default_factory=list)
    output_ports: list[Port] = field(default_factory=list)

    def output_port(self, name: str) -> Port:
        for p in self.output_ports:
            if p.name == name:
                return p
        raise LookupError(f"product {self.id} has no output port {name!r}")

    def input_port(self, name: str) -> Port:
        for p in self.input_ports:
            if p.name == name:
                return p
        raise LookupError(f"product {self.id} has no input port {name!r}")

    def to_dict(self) -> dict[str, Any]:
        return {
            "apiVersion": "1.0.0",
            "kind": "DataProduct",
            "id": self.id,
            "version": self.version,
            "status": self.status,
            "inputPorts": [p.to_dict() for p in self.input_ports],
            "outputPorts": [p.to_dict() for p in self.output_ports],
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "DataProduct":
        return cls(
            id=d["id"],
            version=d.get("version", "0.1.0"),
            status=d.get("status", "active"),
            input_ports=[Port.from_dict(p) for p in d.get("inputPorts", [])],
            output_ports=[Port.from_dict(p) for p in d.get("outputPorts", [])],
        )


class ProductRegistry:
    """Product catalog with contract resolution through ports.

    Backed by any ``ProductStore`` (memory default; FS/SQL persistence in
    ``products/store.py`` — the reference's data-product store tiers), so
    a registry survives the session when given a persistent store."""

    def __init__(self, contract_store: ContractStore, product_store=None) -> None:
        from dc43_spark.products.store import MemoryProductStore

        self.contract_store = contract_store
        self.product_store = (
            product_store if product_store is not None else MemoryProductStore()
        )

    def register(self, product: DataProduct, *, enforce_contracts: bool = True) -> None:
        if enforce_contracts:
            for port in [*product.input_ports, *product.output_ports]:
                if not port.contract_id:
                    if port.source_product:  # source-bound input port:
                        continue  # resolved through the producer at read time
                    raise LookupError(
                        f"port {port.name!r} of {product.id} binds neither a "
                        "contract nor a source product/port"
                    )
                if self.contract_store.resolve(port.contract_id, port.contract_version) is None:
                    raise LookupError(
                        f"port {port.name!r} of {product.id} binds unknown contract "
                        f"{port.contract_id} {port.contract_version}"
                    )
        self.product_store.put(product)

    def get(self, product_id: str, version: Optional[str] = None) -> Optional[DataProduct]:
        if version is not None:
            return self.product_store.get(product_id, version)
        return self.product_store.latest(product_id)

    def resolve_output_contract(self, product_id: str, port_name: str) -> Contract:
        """Contract behind a product's output port (ref local.py:1279-1366)."""
        product = self.get(product_id)
        if product is None:
            raise LookupError(f"unknown product {product_id}")
        port = product.output_port(port_name)
        contract = self.contract_store.resolve(port.contract_id, port.contract_version)
        if contract is None:
            raise LookupError(
                f"contract {port.contract_id} {port.contract_version} not found"
            )
        return contract

    def resolve_input_contract(self, product_id: str, port_name: str) -> Contract:
        product = self.get(product_id)
        if product is None:
            raise LookupError(f"unknown product {product_id}")
        port = product.input_port(port_name)
        contract = self.contract_store.resolve(port.contract_id, port.contract_version)
        if contract is None:
            raise LookupError(
                f"contract {port.contract_id} {port.contract_version} not found"
            )
        return contract

    def resolve_read_contract(self, product_id: str, port_name: str) -> Contract:
        """The contract governing a consumer's read through its input port,
        with the reference backend's priority (ref local.py:1279-1366):

        1. the input port's own contract binding, when declared;
        2. else the SOURCE product's output-port contract — the consumer
           follows the producer's binding (and upgrades) automatically.

        Either way, ``source_contract_version`` (when set) pins the
        resolved contract's version and a mismatch raises — the consumer
        declared it depends on that exact shape."""
        product = self.get(product_id)
        if product is None:
            raise LookupError(f"unknown product {product_id}")
        port = product.input_port(port_name)
        if port.contract_id:
            contract = self.contract_store.resolve(
                port.contract_id, port.contract_version
            )
            if contract is None:
                raise LookupError(
                    f"contract {port.contract_id} {port.contract_version} not found"
                )
        elif port.source_product:
            contract = self.resolve_output_contract(
                port.source_product, port.source_port or port.name
            )
        else:
            raise LookupError(
                f"input port {port_name!r} of {product_id} binds neither a "
                "contract nor a source product/port"
            )
        self._enforce_version_pin(port, contract)
        return contract

    @staticmethod
    def _enforce_version_pin(port: Port, contract: Contract) -> None:
        pin = (port.source_contract_version or "").strip()
        if not pin:
            return
        if pin.startswith("=="):
            pin = pin[2:].strip()
        if contract.version != pin:
            raise ValueError(
                f"input port {port.name!r} pins contract version {pin!r} but "
                f"resolution produced {contract.id}:{contract.version}"
            )
