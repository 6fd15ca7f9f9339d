"""ODCS-lite contract model.

Plain dataclasses mirroring the subset of the Open Data Contract Standard the
reference consumes (ref: dc43-core/src/dc43_core/odcs.py:21-147 and
dc43-integrations spark/contracts.py:193-254) — id/version/status, schema
objects with typed properties, per-field and object-level quality rules,
server (physical location) descriptors, and custom properties.

JSON round-trip follows ODCS field names (``physicalType``, ``required``,
``unique``, ``quality``, ``customProperties``) so contracts written by ODCS
tooling load unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterator, Optional


@dataclass
class QualityRule:
    """One data-quality rule attached to a property or schema object.

    Supported rules (ref engine.py:48-163):
      per-field: ``gt`` ``ge`` ``lt`` ``le`` (numeric bounds), ``enum``,
      ``regex``, ``unique``; ``not_null`` is implied by ``required``.
      object-level: ``query`` — a raw SQL metric (engine 'spark_sql').
    ``severity='warning'`` marks the rule optional (violations -> warnings).
    """

    rule: str
    value: Any = None
    name: Optional[str] = None
    severity: str = "error"
    engine: str = "spark_sql"
    description: Optional[str] = None

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {"rule": self.rule}
        if self.value is not None:
            out["value"] = self.value
        if self.name:
            out["name"] = self.name
        if self.severity != "error":
            out["severity"] = self.severity
        if self.rule == "query":
            out["engine"] = self.engine
        if self.description:
            out["description"] = self.description
        return out

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "QualityRule":
        # Accept ODCS mustBe* spellings as well as our compact form.
        odcs_map = {
            "mustBeGreaterThan": "gt",
            "mustBeGreaterOrEqualTo": "ge",
            "mustBeLessThan": "lt",
            "mustBeLessOrEqualTo": "le",
        }
        rule = data.get("rule")
        value = data.get("value", data.get("mustBe"))
        for odcs_key, short in odcs_map.items():
            if odcs_key in data:
                rule, value = short, data[odcs_key]
                break
        if rule is None:
            raise ValueError(f"quality rule missing 'rule': {data!r}")
        return cls(
            rule=rule,
            value=value,
            name=data.get("name"),
            severity=data.get("severity", "error"),
            engine=data.get("engine", "spark_sql"),
            description=data.get("description"),
        )


@dataclass
class SchemaProperty:
    """A typed column (possibly nested) in a schema object."""

    name: str
    physical_type: str = "string"
    required: bool = False
    unique: bool = False
    properties: list["SchemaProperty"] = field(default_factory=list)  # struct
    items: Optional["SchemaProperty"] = None  # array element
    quality: list[QualityRule] = field(default_factory=list)
    description: Optional[str] = None

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {"name": self.name, "physicalType": self.physical_type}
        if self.required:
            out["required"] = True
        if self.unique:
            out["unique"] = True
        if self.properties:
            out["properties"] = [p.to_dict() for p in self.properties]
        if self.items is not None:
            out["items"] = self.items.to_dict()
        if self.quality:
            out["quality"] = [q.to_dict() for q in self.quality]
        if self.description:
            out["description"] = self.description
        return out

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "SchemaProperty":
        return cls(
            name=data["name"],
            physical_type=data.get("physicalType", data.get("physical_type", "string")),
            required=bool(data.get("required", False)),
            unique=bool(data.get("unique", False)),
            properties=[cls.from_dict(p) for p in data.get("properties", [])],
            items=cls.from_dict(data["items"]) if data.get("items") else None,
            quality=[QualityRule.from_dict(q) for q in data.get("quality", [])],
            description=data.get("description"),
        )


@dataclass
class SchemaObject:
    """A named table-shaped schema with columns and object-level rules."""

    name: str
    properties: list[SchemaProperty] = field(default_factory=list)
    quality: list[QualityRule] = field(default_factory=list)

    def property_names(self) -> list[str]:
        return [p.name for p in self.properties]

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "name": self.name,
            "properties": [p.to_dict() for p in self.properties],
        }
        if self.quality:
            out["quality"] = [q.to_dict() for q in self.quality]
        return out

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "SchemaObject":
        return cls(
            name=data["name"],
            properties=[SchemaProperty.from_dict(p) for p in data.get("properties", [])],
            quality=[QualityRule.from_dict(q) for q in data.get("quality", [])],
        )


@dataclass
class Server:
    """Physical location descriptor (ref odcs.py servers; io/locators.py)."""

    server: str = "local"
    type: str = "filesystem"
    format: Optional[str] = None
    path: Optional[str] = None
    table: Optional[str] = None
    options: dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {"server": self.server, "type": self.type}
        for k in ("format", "path", "table"):
            v = getattr(self, k)
            if v:
                out[k] = v
        if self.options:
            out["options"] = dict(self.options)
        return out

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "Server":
        return cls(
            server=data.get("server", "local"),
            type=data.get("type", "filesystem"),
            format=data.get("format"),
            path=data.get("path"),
            table=data.get("table"),
            options=dict(data.get("options", {})),
        )


@dataclass
class Contract:
    """A versioned data contract: schema + rules + physical binding."""

    id: str
    version: str
    status: str = "active"  # draft | active | rejected | deprecated | retired
    schema_objects: list[SchemaObject] = field(default_factory=list)
    servers: list[Server] = field(default_factory=list)
    custom_properties: dict[str, Any] = field(default_factory=dict)
    description: Optional[str] = None

    @property
    def schema_object(self) -> SchemaObject:
        """The first (canonical) schema object; most contracts have one."""
        if not self.schema_objects:
            raise ValueError(f"contract {self.id}:{self.version} has no schema")
        return self.schema_objects[0]

    def iter_properties(self) -> Iterator[SchemaProperty]:
        yield from self.schema_object.properties

    def to_dict(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "apiVersion": "3.0.2",
            "kind": "DataContract",
            "id": self.id,
            "version": self.version,
            "status": self.status,
            "schema": [o.to_dict() for o in self.schema_objects],
        }
        if self.servers:
            out["servers"] = [s.to_dict() for s in self.servers]
        if self.custom_properties:
            out["customProperties"] = [
                {"property": k, "value": v} for k, v in self.custom_properties.items()
            ]
        if self.description:
            out["description"] = self.description
        return out

    @classmethod
    def from_dict(cls, data: dict[str, Any]) -> "Contract":
        custom: dict[str, Any] = {}
        raw_custom = data.get("customProperties", {})
        if isinstance(raw_custom, list):  # ODCS list-of-{property,value}
            for item in raw_custom:
                custom[item["property"]] = item.get("value")
        elif isinstance(raw_custom, dict):
            custom = dict(raw_custom)
        return cls(
            id=data["id"],
            version=data["version"],
            status=data.get("status", "active"),
            schema_objects=[SchemaObject.from_dict(o) for o in data.get("schema", [])],
            servers=[Server.from_dict(s) for s in data.get("servers", [])],
            custom_properties=custom,
            description=data.get("description"),
        )


def contract_to_dict(contract: Contract) -> dict[str, Any]:
    return contract.to_dict()


def contract_from_dict(data: dict[str, Any]) -> Contract:
    return Contract.from_dict(data)
