"""Misc utilities: comparisons, default factor selection."""

from .compare import compare_beliefs, compare_graphs, compare_variables
from .defaults import select_factor_type
from .labels import incr_suffix

__all__ = ["compare_beliefs", "compare_variables", "compare_graphs",
           "select_factor_type", "incr_suffix"]
