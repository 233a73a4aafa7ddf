from .logging import ScalarLogger, log
from .flops import cost_analysis

__all__ = ["ScalarLogger", "log", "cost_analysis"]
