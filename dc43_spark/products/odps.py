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
    name: str
    contract_id: str
    contract_version: str = "latest"  # selector: ==x.y.z / >=x.y.z / latest
    description: Optional[str] = None

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "contractId": self.contract_id,
            "version": self.contract_version,
            **({"description": self.description} if self.description else {}),
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Port":
        return cls(
            name=d["name"],
            contract_id=d.get("contractId", d.get("contract_id", "")),
            contract_version=d.get("version", "latest"),
            description=d.get("description"),
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
    """In-memory product catalog with contract resolution through ports."""

    def __init__(self, contract_store: ContractStore) -> None:
        self.contract_store = contract_store
        self._products: dict[tuple[str, str], DataProduct] = {}

    def register(self, product: DataProduct, *, enforce_contracts: bool = True) -> None:
        if enforce_contracts:
            for port in [*product.input_ports, *product.output_ports]:
                if self.contract_store.resolve(port.contract_id, port.contract_version) is None:
                    raise LookupError(
                        f"port {port.name!r} of {product.id} binds unknown contract "
                        f"{port.contract_id} {port.contract_version}"
                    )
        self._products[(product.id, product.version)] = product

    def get(self, product_id: str, version: Optional[str] = None) -> Optional[DataProduct]:
        if version is not None:
            return self._products.get((product_id, version))
        versions = sorted(v for (pid, v) in self._products if pid == product_id)
        return self._products.get((product_id, versions[-1])) if versions else None

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
