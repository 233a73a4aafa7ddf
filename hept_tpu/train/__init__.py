from .losses import infonce_loss, focal_loss
from .metrics import acc_and_pr_at_k, binary_classification_metrics

__all__ = [
    "infonce_loss",
    "focal_loss",
    "acc_and_pr_at_k",
    "binary_classification_metrics",
]
