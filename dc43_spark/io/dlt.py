"""DLT-style expectation export + a local execution harness.

Rebuilds the reference's Delta Live Tables bridge (dc43-integrations
spark/dlt.py:27-344 and spark/dlt_local.py:19-323):

- ``dlt_expectations(contract)`` exports the compiled expectation plan as the
  two dicts DLT's decorators take: ``expect_all`` (observed — optional/warn
  rules) and ``expect_all_or_drop`` (enforced rules).
- ``governed_table`` registers an asset function on a pipeline registry with
  its contract; in a real DLT runtime the returned dicts feed
  ``@dlt.expect_all(...)`` / ``@dlt.expect_all_or_drop(...)``.
- ``LocalPipeline`` executes registered assets on any SparkSession: enforced
  predicates DROP failing rows, observed ones only count, and each asset
  gets a report — all violation counts come from ONE aggregate pass per
  asset (the reference's local harness runs one filter+count job per
  expectation, dlt_local.py:228-229).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dc43_spark.contracts.model import Contract
from dc43_spark.engine.validation import apply_contract
from dc43_spark.expectations.compiler import expectation_specs, sql_predicate


def dlt_expectations(contract: Contract) -> dict[str, dict[str, str]]:
    """Expectation plan -> DLT decorator dicts (ref dlt.py:27-120).

    Keys are expectation names, values SQL predicates. Rules with
    ``severity='warning'`` (optional) land in ``expect_all`` (observe-only);
    the rest in ``expect_all_or_drop``. Metric-only rules (unique, query)
    have no row predicate and are skipped, as in the reference."""
    observed: dict[str, str] = {}
    enforced: dict[str, str] = {}
    for spec in expectation_specs(contract):
        predicate = sql_predicate(spec.rule, spec.column, spec.params.get("value"))
        if predicate is None:
            continue
        (observed if spec.optional else enforced)[spec.key] = predicate
    return {"expect_all": observed, "expect_all_or_drop": enforced}


@dataclass
class AssetReport:
    """Per-asset expectation outcome (ref dlt_local.py:19-120)."""

    name: str
    rows_in: int = 0
    rows_out: int = 0
    passed: dict[str, int] = field(default_factory=dict)
    failed: dict[str, int] = field(default_factory=dict)

    @property
    def ok(self) -> bool:
        return all(v == 0 for v in self.failed.values())


@dataclass
class _Asset:
    name: str
    fn: Callable[..., DataFrame]
    contract: Optional[Contract]
    expect_all: dict[str, str]
    expect_all_or_drop: dict[str, str]
    materialized: bool  # table vs view
    align: bool


class LocalPipeline:
    """Local stand-in for a DLT pipeline graph (ref dlt_local.py).

    Assets declare dependencies by calling ``pipeline.read("other")`` inside
    their body; execution is memoised per run."""

    def __init__(self) -> None:
        self._assets: dict[str, _Asset] = {}
        self._results: dict[str, DataFrame] = {}
        self.reports: dict[str, AssetReport] = {}
        self._spark: Optional[SparkSession] = None

    # -------------------------------------------------------- registration

    def governed_table(
        self,
        contract: Optional[Contract] = None,
        *,
        name: Optional[str] = None,
        extra_expect_all: Optional[dict[str, str]] = None,
        extra_expect_all_or_drop: Optional[dict[str, str]] = None,
        align: bool = True,
    ) -> Callable[[Callable[..., DataFrame]], Callable[..., DataFrame]]:
        """Register a table-producing function with contract expectations
        (ref dlt.py:200-344 ``governed_table``)."""
        return self._register(
            contract, name, extra_expect_all, extra_expect_all_or_drop,
            materialized=True, align=align,
        )

    def governed_view(
        self,
        contract: Optional[Contract] = None,
        *,
        name: Optional[str] = None,
        extra_expect_all: Optional[dict[str, str]] = None,
        extra_expect_all_or_drop: Optional[dict[str, str]] = None,
        align: bool = True,
    ) -> Callable[[Callable[..., DataFrame]], Callable[..., DataFrame]]:
        return self._register(
            contract, name, extra_expect_all, extra_expect_all_or_drop,
            materialized=False, align=align,
        )

    def _register(
        self,
        contract: Optional[Contract],
        name: Optional[str],
        extra_observed: Optional[dict[str, str]],
        extra_enforced: Optional[dict[str, str]],
        *,
        materialized: bool,
        align: bool,
    ) -> Callable[[Callable[..., DataFrame]], Callable[..., DataFrame]]:
        def decorator(fn: Callable[..., DataFrame]) -> Callable[..., DataFrame]:
            asset_name = name or fn.__name__
            plan = (
                dlt_expectations(contract)
                if contract is not None
                else {"expect_all": {}, "expect_all_or_drop": {}}
            )
            self._assets[asset_name] = _Asset(
                name=asset_name,
                fn=fn,
                contract=contract,
                expect_all={**plan["expect_all"], **(extra_observed or {})},
                expect_all_or_drop={**plan["expect_all_or_drop"], **(extra_enforced or {})},
                materialized=materialized,
                align=align,
            )
            return fn

        return decorator

    # ----------------------------------------------------------- execution

    def read(self, name: str) -> DataFrame:
        """Dependency access from inside an asset body (ref dlt stub
        ``dlt.read``)."""
        if name not in self._results:
            self._run_asset(name)
        return self._results[name]

    def _run_asset(self, name: str) -> None:
        if name not in self._assets:
            raise KeyError(f"unknown asset {name!r}; registered: {sorted(self._assets)}")
        asset = self._assets[name]
        df = asset.fn(self._spark) if asset.fn.__code__.co_argcount else asset.fn()
        if asset.contract is not None and asset.align:
            df = apply_contract(df, asset.contract)

        observed = dict(asset.expect_all)
        enforced = dict(asset.expect_all_or_drop)
        all_exp = {**observed, **enforced}
        report = AssetReport(name=name)
        if all_exp:
            # one aggregate pass: total + failure count per expectation
            aggs = [F.count(F.lit(1)).alias("_rows")] + [
                F.sum(
                    F.when(~F.coalesce(F.expr(p), F.lit(False)), 1).otherwise(0)
                ).cast("long").alias(f"_f_{i}")
                for i, p in enumerate(all_exp.values())
            ]
            keep = None
            if enforced:
                keep = " AND ".join(
                    f"COALESCE(({p}), FALSE)" for p in enforced.values()
                )
                # rows surviving ALL enforced predicates, in the same pass
                # (per-expectation failures overlap, so they can't be summed)
                aggs.append(
                    F.sum(F.when(F.expr(keep), 1).otherwise(0)).cast("long").alias("_kept")
                )
            row = df.agg(*aggs).collect()[0]
            report.rows_in = row["_rows"]
            for i, key in enumerate(all_exp):
                n_failed = row[f"_f_{i}"] or 0
                report.failed[key] = n_failed
                report.passed[key] = report.rows_in - n_failed
            if keep is not None:
                df = df.filter(F.expr(keep))
                report.rows_out = row["_kept"] or 0
            else:
                report.rows_out = report.rows_in
        else:
            report.rows_in = report.rows_out = df.count()

        self._results[name] = df
        self.reports[name] = report

    def run(self, spark: SparkSession) -> dict[str, AssetReport]:
        """Execute every registered asset (dependency-memoised)."""
        self._spark = spark
        self._results.clear()
        self.reports.clear()
        for name in self._assets:
            if name not in self._results:
                self._run_asset(name)
        return dict(self.reports)


# --------------------------------------------------- runtime-binding layer


@dataclass(frozen=True)
class DltBinding:
    """Introspection record attached to a decorated asset (mirrors the
    reference's ``DLTContractBinding``, dlt.py:120-154): which contract and
    which expectation dicts the decorator registered."""

    contract_id: Optional[str]
    contract_version: Optional[str]
    expect_all: dict[str, str]
    expect_all_or_drop: dict[str, str]


def _resolve_dlt_module(dlt_module: Any = None) -> Any:
    """Explicit module wins; otherwise bind to an importable ``dlt`` (the
    Databricks runtime injects one); else None -> LocalPipeline fallback."""
    if dlt_module is not None:
        return dlt_module
    try:  # pragma: no cover - exercised only on a real DLT runtime
        import dlt  # type: ignore[import-not-found]

        return dlt
    except ImportError:
        return None


def _governed_asset(
    contract: Optional[Contract],
    *,
    view: bool,
    dlt_module: Any,
    pipeline: Optional[LocalPipeline],
    name: Optional[str],
    extra_expect_all: Optional[dict[str, str]],
    extra_expect_all_or_drop: Optional[dict[str, str]],
    asset_kwargs: dict[str, Any],
) -> Callable[[Callable[..., DataFrame]], Callable[..., DataFrame]]:
    plan = (
        dlt_expectations(contract)
        if contract is not None
        else {"expect_all": {}, "expect_all_or_drop": {}}
    )
    observed = {**plan["expect_all"], **(extra_expect_all or {})}
    enforced = {**plan["expect_all_or_drop"], **(extra_expect_all_or_drop or {})}
    binding = DltBinding(
        contract_id=contract.id if contract else None,
        contract_version=contract.version if contract else None,
        expect_all=observed,
        expect_all_or_drop=enforced,
    )
    module = _resolve_dlt_module(dlt_module)

    def decorator(fn: Callable[..., DataFrame]) -> Callable[..., DataFrame]:
        if module is not None:
            # Real DLT runtime: expectations innermost, asset decorator
            # outermost — the reference's application order (dlt.py:289-300),
            # so the runtime evaluates expectations on the produced frame.
            decorated: Any = fn
            if enforced:
                decorated = module.expect_all_or_drop(dict(enforced))(decorated)
            if observed:
                decorated = module.expect_all(dict(observed))(decorated)
            kwargs = dict(asset_kwargs)
            if name:
                kwargs.setdefault("name", name)
            decorated = (module.view if view else module.table)(**kwargs)(decorated)
            decorated.__dc43_binding__ = binding
            return decorated
        target = pipeline if pipeline is not None else _ambient_pipeline()
        register = target.governed_view if view else target.governed_table
        decorated = register(
            contract,
            name=name,
            extra_expect_all=extra_expect_all,
            extra_expect_all_or_drop=extra_expect_all_or_drop,
        )(fn)
        decorated.__dc43_binding__ = binding
        return decorated

    return decorator


_AMBIENT: list[LocalPipeline] = []


def _ambient_pipeline() -> LocalPipeline:
    """Shared fallback pipeline for decorator use without an explicit one
    (lets a DLT notebook file import-and-run unchanged off-platform)."""
    if not _AMBIENT:
        _AMBIENT.append(LocalPipeline())
    return _AMBIENT[0]


def governed_table(
    contract: Optional[Contract] = None,
    *,
    dlt_module: Any = None,
    pipeline: Optional[LocalPipeline] = None,
    name: Optional[str] = None,
    extra_expect_all: Optional[dict[str, str]] = None,
    extra_expect_all_or_drop: Optional[dict[str, str]] = None,
    **asset_kwargs: Any,
) -> Callable[[Callable[..., DataFrame]], Callable[..., DataFrame]]:
    """Contract-governed ``@dlt.table`` (ref dlt.py:269-300).

    On a Databricks DLT runtime (``import dlt`` succeeds, or ``dlt_module``
    passed) this produces a real DLT table asset with the contract's
    expectations registered via ``expect_all`` / ``expect_all_or_drop``.
    Anywhere else it registers on a :class:`LocalPipeline` (given or
    ambient), which enforces the same dicts with the same drop semantics —
    so one pipeline file runs in both environments."""
    return _governed_asset(
        contract,
        view=False,
        dlt_module=dlt_module,
        pipeline=pipeline,
        name=name,
        extra_expect_all=extra_expect_all,
        extra_expect_all_or_drop=extra_expect_all_or_drop,
        asset_kwargs=asset_kwargs,
    )


def governed_view(
    contract: Optional[Contract] = None,
    *,
    dlt_module: Any = None,
    pipeline: Optional[LocalPipeline] = None,
    name: Optional[str] = None,
    extra_expect_all: Optional[dict[str, str]] = None,
    extra_expect_all_or_drop: Optional[dict[str, str]] = None,
    **asset_kwargs: Any,
) -> Callable[[Callable[..., DataFrame]], Callable[..., DataFrame]]:
    """Contract-governed ``@dlt.view`` (ref dlt.py:302-330); see
    :func:`governed_table` for the runtime-vs-local binding rules."""
    return _governed_asset(
        contract,
        view=True,
        dlt_module=dlt_module,
        pipeline=pipeline,
        name=name,
        extra_expect_all=extra_expect_all,
        extra_expect_all_or_drop=extra_expect_all_or_drop,
        asset_kwargs=asset_kwargs,
    )
