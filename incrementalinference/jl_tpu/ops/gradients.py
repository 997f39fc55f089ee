"""Factor jacobians and information propagation.

Reference: src/services/FactorGradients.jl (factorJacobian :5-35,
FactorGradientsCached! :137-160, calcPerturbationFromVariable) and
src/entities/FactorGradients.jl.  The reference builds block jacobians by
±h finite differences with slack residuals; here jacobians are exact
``jax.jacfwd`` in tangent coordinates.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

__all__ = ["factor_jacobian", "FactorGradientsCached",
           "calc_perturbation_from_variable"]


def factor_jacobian(fg, factor_label: str, meas: jnp.ndarray | None = None,
                    at_points: Sequence[jnp.ndarray] | None = None
                    ) -> jnp.ndarray:
    """Full block jacobian ∂residual/∂(tangent of each variable), evaluated
    at the variables' current mean points (reference factorJacobian)."""
    f = fg.factor(factor_label)
    model = f.model
    manifolds = [fg.var(v).manifold for v in f.variables]
    if at_points is None:
        at_points = [m.mean(fg.points(v)) for m, v in
                     zip(manifolds, f.variables)]
    if meas is None:
        mu, _ = model.mean_cov()
        meas = mu

    dofs = [m.dof for m in manifolds]

    def res_of_tangents(*Xs):
        pts = [m.exp(p, X) for m, p, X in zip(manifolds, at_points, Xs)]
        return model.residual(meas, *pts)

    zeros = [jnp.zeros((d,)) for d in dofs]
    blocks = [jax.jacfwd(res_of_tangents, argnums=i)(*zeros)
              for i in range(len(dofs))]
    return jnp.concatenate(blocks, axis=-1)       # (resdim, Σ dof)


class FactorGradientsCached:
    """Cached per-factor jacobian blocks + perturbation propagation
    (reference FactorGradientsCached!, src/entities/FactorGradients.jl)."""

    def __init__(self, fg, factor_label: str):
        self.fg = fg
        self.factor_label = factor_label
        f = fg.factor(factor_label)
        self.variables = f.variables
        self.manifolds = [fg.var(v).manifold for v in f.variables]
        self.dofs = [m.dof for m in self.manifolds]
        self.offsets = [0]
        for d in self.dofs:
            self.offsets.append(self.offsets[-1] + d)
        self._J = None

    def __call__(self, at_points=None, meas=None) -> jnp.ndarray:
        self._J = factor_jacobian(self.fg, self.factor_label, meas=meas,
                                  at_points=at_points)
        return self._J

    @property
    def J(self) -> jnp.ndarray:
        if self._J is None:
            self()
        return self._J

    def block(self, var: str) -> jnp.ndarray:
        i = self.variables.index(var)
        return self.J[:, self.offsets[i]:self.offsets[i + 1]]


def calc_perturbation_from_variable(cache: FactorGradientsCached,
                                    src: str, delta: jnp.ndarray
                                    ) -> Dict[str, jnp.ndarray]:
    """Propagate a tangent perturbation of ``src`` through the factor to
    first order onto the other variables (reference
    calcPerturbationFromVariable): δr = J_src δx; δx_other = J_other⁺ δr."""
    J_src = cache.block(src)
    dr = J_src @ delta
    out = {}
    for v in cache.variables:
        if v == src:
            continue
        J_v = cache.block(v)
        # least-squares transfer through the residual
        out[v] = -jnp.linalg.pinv(J_v) @ dr
    return out
