"""Misc utilities: comparisons, default factor selection."""

from .compare import compare_beliefs, compare_graphs, compare_variables
from .defaults import select_factor_type

__all__ = ["compare_beliefs", "compare_variables", "compare_graphs",
           "select_factor_type"]
