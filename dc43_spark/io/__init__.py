from dc43_spark.io.read import read_with_contract
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
    "WriteResult",
    "NoOpWriteViolationStrategy",
    "SplitWriteViolationStrategy",
    "FlagWriteViolationStrategy",
    "StrictWriteViolationStrategy",
    "WritePlan",
    "WriteRequest",
    "WriteStrategyContext",
]
