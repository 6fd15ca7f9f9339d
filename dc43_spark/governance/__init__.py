from dc43_spark.governance.orchestrator import GovernanceService
from dc43_spark.governance.stores import (
    FSGovernanceStore,
    GovernanceStore,
    MemoryGovernanceStore,
)

__all__ = [
    "GovernanceService",
    "GovernanceStore",
    "MemoryGovernanceStore",
    "FSGovernanceStore",
]
