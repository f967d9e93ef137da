from .models import (
    attach_expected_metric,
    compare_models,
    fit_expected_metric_model,
    train_test_split,
)

__all__ = [
    "attach_expected_metric",
    "compare_models",
    "fit_expected_metric_model",
    "train_test_split",
]
