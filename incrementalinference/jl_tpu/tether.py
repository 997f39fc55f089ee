"""Dead-reckon tether: parametric mean accumulation along factor chains.

Reference: src/services/TetherUtils.jl (accumulateFactorMeans :119-158,
rebaseFactorVariable! :59) and
src/parametric/services/ConsolidateParametricRelatives.jl
(solveFactorParametric :15+).  Used for real-time dead-reckon prediction
outside tree solves.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from .ops.convolve import batched_gauss_newton

__all__ = ["solve_factor_parametric", "accumulate_factor_means",
           "rebase_factor_variable"]


def solve_factor_parametric(fg, factor_label: str, target: str,
                            values: dict | None = None) -> jnp.ndarray:
    """Point-solve one factor for ``target`` given mean values of the other
    variables (reference solveFactorParametric)."""
    f = fg.factor(factor_label)
    model = f.model
    manifold = fg.var(target).manifold
    sfidx = f.variables.index(target)

    def mean_of(v):
        if values is not None and v in values:
            return jnp.asarray(values[v])
        var = fg.var(v)
        if var.parametric_point is not None:
            return var.parametric_point
        return var.manifold.mean(fg.points(v))

    mu, _ = model.mean_cov()
    if f.is_prior:
        if hasattr(model, "meas_to_points"):
            return model.meas_to_points(mu[None, :], manifold)[0]
        return mu

    others = tuple(mean_of(v)[None, :] for v in f.variables if v != target)
    x0 = mean_of(target)[None, :]
    solved = batched_gauss_newton(manifold, model, mu[None, :], others, x0,
                                  sf_slot=sfidx, iters=25)
    return solved[0]


def accumulate_factor_means(fg, factor_labels: Sequence[str]) -> jnp.ndarray:
    """Walk a chain of relative factors, accumulating the parametric mean
    from the first factor's first variable (reference accumulateFactorMeans,
    TetherUtils.jl:119-158)."""
    values: dict = {}
    current = None
    for fl in factor_labels:
        f = fg.factor(fl)
        if current is None:
            start = f.variables[0]
            var = fg.var(start)
            values[start] = (var.parametric_point
                             if var.parametric_point is not None
                             else var.manifold.mean(fg.points(start)))
            current = start
        nxt = [v for v in f.variables if v != current]
        if len(nxt) != 1:
            raise ValueError(f"factor {fl} does not continue the chain "
                             f"from {current}")
        target = nxt[0]
        values[target] = solve_factor_parametric(fg, fl, target,
                                                 values=values)
        current = target
    return values[current]


def rebase_factor_variable(fg, factor_label: str, old_var: str,
                           new_var: str) -> None:
    """Re-point a factor at a different variable (reference
    rebaseFactorVariable! — used when re-anchoring the dead-reckon tether)."""
    f = fg.factor(factor_label)
    if old_var not in f.variables:
        raise ValueError(f"{old_var} not in factor {factor_label}")
    if new_var not in fg.variables:
        raise ValueError(f"unknown variable {new_var}")
    f.variables = tuple(new_var if v == old_var else v for v in f.variables)
    fg._var_factors[old_var].remove(factor_label)
    fg._var_factors[new_var].append(factor_label)
