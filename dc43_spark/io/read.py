"""Governed batch read: load -> observe -> evaluate -> align -> gate.

ref: dc43-integrations spark/io/read.py:86-160 and BaseReadExecutor
(spark/io/base.py:217-422). The single material difference: observations run
as ONE aggregate job (engine.metrics) instead of one job per rule.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession

from dc43_spark.contracts.model import Contract
from dc43_spark.contracts.schema import schema_snapshot
from dc43_spark.engine.metrics import compute_metrics
from dc43_spark.engine.results import ValidationResult
from dc43_spark.engine.validation import apply_contract, evaluate_contract

DEFAULT_ALLOWED_STATUSES = ("active",)


class ContractStatusError(RuntimeError):
    pass


class ValidationBlockedError(RuntimeError):
    def __init__(self, message: str, result: ValidationResult) -> None:
        super().__init__(message)
        self.result = result


#: formats with no embedded schema: the scan needs one up front, and the
#: governed read supplies the CONTRACT's (schema-on-read) — otherwise CSV
#: observes all-string columns and every typed field "mismatches"
SCHEMALESS_FORMATS = ("csv", "json", "text")


@dataclass
class ReadRequest:
    """Normalised read parameters (ref spark/io/common.py:66-93)."""

    path: Optional[str] = None
    table: Optional[str] = None
    format: Optional[str] = None
    options: dict[str, str] = field(default_factory=dict)
    streaming: bool = False
    load_paths: Optional[list[str]] = None  # multi-path scan (folder versions)
    schema: Optional[Any] = None  # StructType for schema-less formats


def check_contract_status(
    contract: Contract, allowed_statuses: tuple[str, ...] = DEFAULT_ALLOWED_STATUSES,
    *, enforce: bool = True,
) -> Optional[str]:
    """Contract status gate (ref spark/io/validation.py:130-211)."""
    if contract.status in allowed_statuses:
        return None
    msg = (
        f"contract {contract.id}:{contract.version} status "
        f"{contract.status!r} not in allowed {list(allowed_statuses)}"
    )
    if enforce:
        raise ContractStatusError(msg)
    return msg


def _resolve_request(contract: Contract, request: Optional[ReadRequest]) -> ReadRequest:
    req = request or ReadRequest()
    if req.path or req.table:
        return req
    for server in contract.servers:  # contract-first locator (ref locators.py:63-257)
        if server.path or server.table:
            return ReadRequest(
                path=server.path,
                table=server.table,
                format=req.format or server.format,
                options={**server.options, **req.options},
            )
    raise ValueError(
        f"no path/table given and contract {contract.id} declares no server location"
    )


def load_dataframe(spark: SparkSession, request: ReadRequest) -> DataFrame:
    """The scan (ref base.py:404-422): format+options+table/path, batch or
    streaming. Lazy — no job is triggered here."""
    if request.format == "snaplog":
        from dc43_spark.io.snaplog import SnaplogTable

        if request.table or not request.path:
            raise ValueError("snaplog sources are path-based")
        opts = request.options or {}
        if request.streaming:
            # commit-offset streaming through the registered Python data
            # source (io/snaplog_source.py); registration is idempotent
            from dc43_spark.io.snaplog_source import SnaplogDataSource

            if "filters" in opts:
                raise ValueError(
                    "filters= is a batch data-skipping option; a snaplog "
                    "stream serves whole commits — filter the stream"
                )
            spark.dataSource.register(SnaplogDataSource)
            reader = spark.readStream.format("snaplog")
            for k, v in opts.items():
                reader = reader.option(k, v)
            return reader.load(request.path)
        version = opts.get("versionAsOf")
        ts = opts.get("timestampAsOf")
        if isinstance(ts, str):
            try:
                ts = float(ts)
            except ValueError:
                # ContractVersionLocator emits ISO-8601 instants
                # (locators.py time-travel contract); naive stamps are UTC
                import datetime as _dt

                parsed = _dt.datetime.fromisoformat(ts)
                if parsed.tzinfo is None:
                    parsed = parsed.replace(tzinfo=_dt.timezone.utc)
                ts = parsed.timestamp()
        return SnaplogTable(spark, request.path).read(
            version_as_of=int(version) if version is not None else None,
            timestamp_as_of=ts,
            tag=opts.get("tagAsOf"),
            # pyarrow-DNF data skipping (snaplog.read) — a governed read
            # of a clustered table prunes files before the scan
            filters=opts.get("filters"),
        )
    if request.format == "delta" and request.path:
        from dc43_spark.io.merge import delta_available

        if not delta_available() and request.streaming:
            # commit-offset streaming over a real _delta_log through the
            # registered Python data source (io/delta_source.py) when
            # the jar is absent; Delta's own source options pass through
            from dc43_spark.io.delta_source import DeltaLogDataSource

            spark.dataSource.register(DeltaLogDataSource)
            reader = spark.readStream.format("deltalog")
            for k, v in (request.options or {}).items():
                reader = reader.option(k, v)
            return reader.load(request.path)
        if not delta_available():
            # protocol-level fallback (io/delta_log.py): the emitted
            # versionAsOf/timestampAsOf options are honored by a pure
            # _delta_log reader when the delta-spark jar is absent
            from dc43_spark.io.delta_log import delta_read_fallback

            return delta_read_fallback(spark, request.path, request.options)
    reader = spark.readStream if request.streaming else spark.read
    if request.format:
        reader = reader.format(request.format)
    elif request.path:
        reader = reader.format("parquet")
    if request.schema is not None:
        reader = reader.schema(request.schema)
    if request.options:
        reader = reader.options(**request.options)
    if request.table:
        return reader.table(request.table)
    if request.load_paths:
        return reader.load(request.load_paths)
    return reader.load(request.path)


def resolve_port_contract(
    registry: Any,
    product: Optional[str],
    port: Optional[str],
    *,
    operation: str,
) -> Contract:
    """Shared product/port -> contract resolution for governed IO entry
    points. Reads resolve through the consumer's INPUT port (falling back
    to the producer's output-port binding — ref local.py:1279-1366);
    writes resolve the product's own OUTPUT port."""
    if registry is None or product is None or port is None:
        raise ValueError(
            "port-bound IO needs registry=, product= and port= together"
        )
    if operation == "read":
        return registry.resolve_read_contract(product, port)
    return registry.resolve_output_contract(product, port)


def read_with_contract(
    spark: SparkSession,
    contract: Optional[Contract] = None,
    *,
    product: Optional[str] = None,
    port: Optional[str] = None,
    registry: Optional[Any] = None,
    path: Optional[str] = None,
    table: Optional[str] = None,
    format: Optional[str] = None,
    options: Optional[dict[str, str]] = None,
    enforce: bool = True,
    auto_cast: bool = True,
    keep_extra_columns: bool = False,
    allowed_statuses: tuple[str, ...] = DEFAULT_ALLOWED_STATUSES,
    unique_strategy: str = "exact",
    metrics: bool = True,
    locator: Optional["DatasetLocator"] = None,
    status_strategy: Optional["ReadStatusStrategy"] = None,
    interceptors: Optional[list["GovernanceInterceptor"]] = None,
) -> tuple[DataFrame, ValidationResult]:
    """Read a dataset under contract governance.

    Returns the contract-aligned DataFrame plus the validation verdict.
    ``enforce`` raises on ``block`` (reads only block on schema errors /
    required-null failures; plain rule violations warn — ref
    local.py:1990-2003). ``metrics=False`` skips the observation pass and
    returns a schema-only result (cheap path for huge scans).

    Instead of a ``contract``, pass ``registry=``, ``product=`` and
    ``port=`` to read through a data product's INPUT port: the consumer's
    port binding (or its source product's output port) names the
    governing contract."""
    if contract is None:
        contract = resolve_port_contract(registry, product, port, operation="read")
    elif product is not None or port is not None:
        raise ValueError("pass either contract= or product=/port=, not both")
    warnings: list[str] = []
    status_msg = check_contract_status(contract, allowed_statuses, enforce=enforce)
    if status_msg:
        warnings.append(status_msg)

    if locator is not None:
        from dc43_spark.io.locators import DatasetResolution

        res = locator.for_read(
            contract,
            DatasetResolution(
                path=path, table=table, format=format, options=dict(options or {})
            ),
        )
        request = ReadRequest(
            path=res.path, table=res.table, format=res.format,
            options=res.options, load_paths=res.load_paths,
        )
        if not (request.path or request.table):
            request = _resolve_request(contract, request)
    else:
        request = _resolve_request(
            contract,
            ReadRequest(path=path, table=table, format=format, options=dict(options or {})),
        )
    if interceptors is None:
        from dc43_spark.io.status import discover_interceptors

        interceptors = discover_interceptors(spark, "read")
    if (
        request.schema is None
        and request.table is None
        and not keep_extra_columns
        and (request.format or "").lower() in SCHEMALESS_FORMATS
    ):
        # schema-on-read: the contract IS the schema for formats that
        # carry none — the scan comes back typed (and prunable) instead
        # of all-string columns that block on "type mismatch". Skipped
        # under keep_extra_columns: a reader schema would silently DROP
        # the extra columns at the scan; inference keeps them (as
        # strings), which is what that flag asks for.
        from dc43_spark.contracts.schema import contract_to_struct_type

        request.schema = contract_to_struct_type(contract)
    io_ctx = None
    if interceptors:
        from dc43_spark.io.status import IoContext

        io_ctx = IoContext(
            operation="read", contract=contract,
            path=request.path, table=request.table, format=request.format,
        )
        for hook in interceptors:
            hook.pre_read(io_ctx)
    df = load_dataframe(spark, request)

    snapshot = schema_snapshot(df)
    metric_values: dict[str, Any] = {}
    if metrics:
        metric_values = compute_metrics(df, contract, unique_strategy=unique_strategy)
    result = evaluate_contract(
        contract, schema=snapshot, metrics=metric_values, operation="read"
    )
    if warnings:
        result = result.merge(ValidationResult(warnings=warnings, status="warn"))
    aligned = apply_contract(
        df, contract, auto_cast=auto_cast, keep_extra_columns=keep_extra_columns
    )
    if status_strategy is not None:
        aligned, result = status_strategy.apply(aligned, result, contract)
    elif enforce and result.status == "block":
        raise ValidationBlockedError(
            f"read blocked for {contract.id}:{contract.version}: {result.errors}",
            result,
        )
    if interceptors:
        for hook in interceptors:
            hook.post_read(io_ctx, aligned, result)
    return aligned, result


def read_stream_with_contract(
    spark: SparkSession,
    contract: Optional[Contract] = None,
    *,
    product: Optional[str] = None,
    port: Optional[str] = None,
    registry: Optional[Any] = None,
    path: Optional[str] = None,
    table: Optional[str] = None,
    format: Optional[str] = None,
    options: Optional[dict[str, str]] = None,
    enforce: bool = True,
    auto_cast: bool = True,
    keep_extra_columns: bool = False,
    allowed_statuses: tuple[str, ...] = DEFAULT_ALLOWED_STATUSES,
) -> tuple[DataFrame, ValidationResult]:
    """Governed STREAMING read: contract status gate + schema-on-read +
    align/cast, returning the streaming DataFrame plus a SCHEMA-ONLY
    verdict. Row-level metrics cannot aggregate an unbounded stream up
    front — attach ``StreamingGovernedWriter`` (or ``observe_stream``)
    downstream for per-micro-batch validation; this entry point covers
    the read half: location resolution from the contract's servers,
    contract schema for schema-less sources, and a blocking verdict on
    schema errors before the query ever starts. Accepts the same
    ``product=``/``port=``/``registry=`` binding as batch reads."""
    if contract is None:
        contract = resolve_port_contract(registry, product, port, operation="read")
    elif product is not None or port is not None:
        raise ValueError("pass either contract= or product=/port=, not both")
    warnings: list[str] = []
    status_msg = check_contract_status(contract, allowed_statuses, enforce=enforce)
    if status_msg:
        warnings.append(status_msg)
    request = _resolve_request(
        contract,
        ReadRequest(
            path=path, table=table, format=format,
            options=dict(options or {}), streaming=True,
        ),
    )
    request.streaming = True
    if request.schema is None and request.table is None:
        # streaming FILE sources require a schema up front (Spark refuses
        # to infer on an unbounded directory). Self-describing formats
        # (parquet/orc) get a one-off STATIC metadata read so validation
        # sees the TRUE on-disk schema — supplying the contract's schema
        # there would conjure missing columns as nulls and defeat the
        # schema gate. Schema-less formats take the contract's schema
        # (the batch schema-on-read rule), except under
        # keep_extra_columns where static inference keeps the extras.
        fmt = (request.format or "parquet").lower()
        if fmt in SCHEMALESS_FORMATS and not keep_extra_columns:
            from dc43_spark.contracts.schema import contract_to_struct_type

            request.schema = contract_to_struct_type(contract)
        else:
            from dataclasses import replace

            request.schema = load_dataframe(
                spark, replace(request, streaming=False)
            ).schema
    df = load_dataframe(spark, request)
    snapshot = schema_snapshot(df)
    result = evaluate_contract(contract, schema=snapshot, metrics={}, operation="read")
    if warnings:
        result = result.merge(ValidationResult(warnings=warnings, status="warn"))
    aligned = apply_contract(
        df, contract, auto_cast=auto_cast, keep_extra_columns=keep_extra_columns
    )
    if enforce and result.status == "block":
        raise ValidationBlockedError(
            f"streaming read blocked for {contract.id}:{contract.version}: "
            f"{result.errors}",
            result,
        )
    return aligned, result
