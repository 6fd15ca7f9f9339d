from dc43_spark.engine.metrics import compute_metrics, metric_expressions, observe_metrics
from dc43_spark.engine.results import ValidationResult
from dc43_spark.engine.validation import apply_contract, evaluate_contract, evaluate_dataframe

__all__ = [
    "compute_metrics",
    "metric_expressions",
    "observe_metrics",
    "ValidationResult",
    "apply_contract",
    "evaluate_contract",
    "evaluate_dataframe",
]
