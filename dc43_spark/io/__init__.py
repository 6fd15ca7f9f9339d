from dc43_spark.io.dlt import LocalPipeline, dlt_expectations
from dc43_spark.io.locators import (
    ContractFirstDatasetLocator,
    ContractVersionLocator,
    DatasetResolution,
    StaticDatasetLocator,
    delta_time_travel_options,
)
from dc43_spark.io.merge import MergeClause, MergeResult, merge_with_contract
from dc43_spark.io.read import read_with_contract
from dc43_spark.io.status import (
    DowngradeBlockedReadStatus,
    EnforceReadStatus,
    FilterInvalidRowsReadStatus,
    GovernanceInterceptor,
    IoContext,
)
from dc43_spark.io.violation_strategy import (
    FlagWriteViolationStrategy,
    NoOpWriteViolationStrategy,
    SplitWriteViolationStrategy,
    StrictWriteViolationStrategy,
    WritePlan,
    WriteRequest,
    WriteStrategyContext,
)
from dc43_spark.io.write import WriteResult, write_with_contract

__all__ = [
    "read_with_contract",
    "write_with_contract",
    "merge_with_contract",
    "MergeResult",
    "MergeClause",
    "WriteResult",
    "ContractFirstDatasetLocator",
    "ContractVersionLocator",
    "StaticDatasetLocator",
    "DatasetResolution",
    "delta_time_travel_options",
    "EnforceReadStatus",
    "DowngradeBlockedReadStatus",
    "FilterInvalidRowsReadStatus",
    "GovernanceInterceptor",
    "IoContext",
    "LocalPipeline",
    "dlt_expectations",
    "NoOpWriteViolationStrategy",
    "SplitWriteViolationStrategy",
    "FlagWriteViolationStrategy",
    "StrictWriteViolationStrategy",
    "WritePlan",
    "WriteRequest",
    "WriteStrategyContext",
]
