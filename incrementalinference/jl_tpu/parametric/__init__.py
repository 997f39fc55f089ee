"""Parametric (Gaussian NLLS) solver stack."""

from .solver import (ParametricProblem, autoinit_parametric,
                     solve_conditionals_parametric, solve_graph_parametric)

__all__ = [
    "ParametricProblem", "solve_graph_parametric",
    "solve_conditionals_parametric", "autoinit_parametric",
]
