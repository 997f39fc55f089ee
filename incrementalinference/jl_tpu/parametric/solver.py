"""Batch parametric solver: damped Gauss-Newton / LM over tangent state.

TPU-native rebuild of the reference's parametric stack
(src/parametric/services/ParametricUtils.jl solveGraphParametricOptim,
ParametricManopt.jl solve_RLM): the graph's variables flatten into one
tangent coordinate vector at per-variable linearization points; factors
stack into *type-homogeneous groups* (the reference's ArrayPartition
grouping, ParametricUtils.jl:205-220) whose residuals evaluate as one vmap
per group; whitened residuals feed a jitted Levenberg-Marquardt loop with
jacobians by ``jax.jacfwd`` (the reference uses FiniteDiff) and analytic
covariance Σ = (JᵀJ)⁻¹ (ParametricManopt.jl:360-374).

Max-mixture (reference MaxMixture, src/services/MaxMixture.jl): Mixture
factors contribute the best-component residual via a smooth-free argmin
select inside the vmapped group evaluation.

Multi-chip: the group evaluation is embarrassingly data-parallel over
factors — parallel/mesh.py shards factor groups across the device mesh and
psums JᵀJ/Jᵀr (SURVEY.md §2.9 mapping of process-distributed solves onto
collectives).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import FactorGraph
from ..models.factors import GenericMarginal, MetaPrior, Mixture

__all__ = ["ParametricProblem", "solve_graph_parametric",
           "solve_conditionals_parametric", "autoinit_parametric"]


def _sqrt_inv(cov: jnp.ndarray) -> jnp.ndarray:
    """Whitening matrix W with Wᵀ W = Σ⁻¹ (inverse Cholesky factor)."""
    L = jnp.linalg.cholesky(cov + 1e-10 * jnp.eye(cov.shape[-1]))
    return jnp.linalg.inv(L)


class _Group:
    """A stack of same-structure factors: vmapped residual evaluation."""

    def __init__(self, models, meas, sqrt_inv, var_slots, ptdims, mix=None,
                 tdofs=(), arg_manifolds=(), col_ids=None):
        self.models = models          # pytree with leading factor axis
        self.meas = meas              # (F, zdim)
        self.sqrt_inv = sqrt_inv      # (F, zdim, zdim)
        self.var_slots = var_slots    # (F, arity) int array of var indices
        self.ptdims = ptdims          # static per-arg point dims
        self.mix = mix                # optional (w (F,C), mus (F,C,z), sqi (F,C,z,z))
        self.tdofs = tdofs            # static per-arg tangent dofs
        self.arg_manifolds = arg_manifolds   # static per-arg manifolds
        self.col_ids = col_ids        # (F, local_dof) global state columns
        self.row_base = 0             # global residual row offset


class ParametricProblem:
    """Flattened tangent-space NLLS problem over a (sub)graph."""

    def __init__(self, fg: FactorGraph,
                 variables: Optional[Sequence[str]] = None,
                 factors: Optional[Sequence[str]] = None,
                 frozen: Sequence[str] = (),
                 solve_key: str = "parametric"):
        self.fg = fg
        self.solve_key = solve_key
        self.var_labels = list(variables or fg.ls())
        self.manifolds = [fg.var(v).manifold for v in self.var_labels]
        self.dofs = [m.dof for m in self.manifolds]
        self.offsets = np.concatenate([[0], np.cumsum(self.dofs)])
        self.total_dof = int(self.offsets[-1])
        self.slot = {v: i for i, v in enumerate(self.var_labels)}

        free = np.ones(self.total_dof, bool)
        for v in frozen:
            i = self.slot[v]
            free[self.offsets[i]:self.offsets[i + 1]] = False
        # kept as host numpy: inside jit these become CONSTANT index arrays
        # (traced-index gathers compile pathologically on TPU)
        self.free_idx = np.nonzero(free)[0]

        # linearization points: parametric point > belief mean > identity
        p0 = []
        for v, m in zip(self.var_labels, self.manifolds):
            var = fg.var(v)
            if var.parametric_point is not None:
                p0.append(var.parametric_point)
            elif var.is_initialized():
                p0.append(m.mean(var.belief().points))
            else:
                p0.append(m.identity())
        self.p0 = [jnp.asarray(p) for p in p0]

        self.groups = self._build_groups(factors)

    # -- factor grouping --------------------------------------------------
    def _build_groups(self, factors) -> List[_Group]:
        from jax import tree_util
        buckets: Dict[Tuple, List] = {}
        flabels = list(factors or self.fg.lsf())
        for fl in flabels:
            f = self.fg.factor(fl)
            if isinstance(f.model, (MetaPrior, GenericMarginal)):
                continue
            if f.solvable <= 0:
                continue
            if any(v not in self.slot for v in f.variables):
                continue
            model = f.model
            is_mix = isinstance(model, Mixture)
            treedef = tree_util.tree_structure(model)
            key = (treedef, len(f.variables), is_mix,
                   tuple(self.manifolds[self.slot[v]] for v in f.variables))
            buckets.setdefault(key, []).append(f)

        groups = []
        for (treedef, arity, is_mix, _), fs in buckets.items():
            models = jax.tree.map(lambda *xs: jnp.stack(xs), *[f.model for f in fs]) \
                if len(fs) > 1 else jax.tree.map(lambda x: jnp.asarray(x)[None], fs[0].model)
            slots_py = [[self.slot[v] for v in f.variables] for f in fs]
            slots = np.asarray(slots_py, np.int32)
            ptdims = tuple(self.manifolds[s].point_dim for s in slots_py[0])
            tdofs = tuple(self.manifolds[s].dof for s in slots_py[0])
            arg_manifolds = tuple(self.manifolds[s] for s in slots_py[0])
            col_ids = np.asarray([
                np.concatenate([np.arange(self.offsets[s],
                                          self.offsets[s] + self.dofs[s])
                                for s in srow]).astype(np.int32)
                for srow in slots_py])
            mix = None
            if is_mix:
                ws, mus, sqis = [], [], []
                for f in fs:
                    w, m_, c_ = f.model.mixture_mean_cov()
                    ws.append(w)
                    mus.append(m_)
                    sqis.append(jnp.stack([_sqrt_inv(c_[k])
                                           for k in range(c_.shape[0])]))
                mix = (jnp.stack(ws), jnp.stack(mus), jnp.stack(sqis))
                # meas/sqrt_inv unused on the mixture path (per-component
                # mus/whiteners live in ``mix``)
                meas = mix[1][:, 0]
                sqi = mix[2][:, 0]
            else:
                mus, covs = zip(*(f.model.mean_cov() for f in fs))
                meas = jnp.stack(mus)
                sqi = jnp.stack([_sqrt_inv(c) for c in covs])
            groups.append(_Group(models, meas, sqi, slots, ptdims, mix,
                                 tdofs=tdofs, arg_manifolds=arg_manifolds,
                                 col_ids=col_ids))
        # assign global residual row offsets
        base = 0
        for g in groups:
            g.row_base = base
            base += g.meas.shape[0] * g.meas.shape[1]
        self.n_residuals = base
        return groups

    # -- state <-> points -------------------------------------------------
    def points_of(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        pts = []
        for i, (m, p) in enumerate(zip(self.manifolds, self.p0)):
            xi = x[int(self.offsets[i]):int(self.offsets[i + 1])]
            pts.append(m.exp(p, xi))
        return pts

    def _p0_stacked(self, p0=None) -> jnp.ndarray:
        p0 = self.p0 if p0 is None else p0
        pd = max(p.shape[-1] for p in p0)
        return jnp.stack([jnp.pad(p, (0, pd - p.shape[-1]))
                          for p in p0])

    def _retract_stacked(self, x: jnp.ndarray, p0s: jnp.ndarray) -> jnp.ndarray:
        """exp each variable's tangent slice at its stacked linearization row."""
        rows = []
        pd = p0s.shape[-1]
        for i, m in enumerate(self.manifolds):
            xi = x[int(self.offsets[i]):int(self.offsets[i + 1])]
            pt = m.exp(p0s[i, :m.point_dim], xi)
            rows.append(jnp.pad(pt, (0, pd - m.point_dim)))
        return jnp.stack(rows)

    def _group_res(self, g: _Group, x: jnp.ndarray, p0s: jnp.ndarray,
                   with_jac: bool):
        """(r (F, z) [, J (F, z, local_dof)]) with *local* jacobians — the
        jacfwd width is the factor's own tangent dims, so compile time is
        independent of the graph size (the reference's sparse-jacobian
        design, ParametricManopt.jl:153-231, done with gathers instead of
        graph coloring)."""
        arity = g.var_slots.shape[1]
        ptdims, tdofs, mans = g.ptdims, g.tdofs, g.arg_manifolds
        base = p0s[g.var_slots]                   # (F, arity, pdmax)
        xloc = x[g.col_ids]                       # (F, local_dof)

        def local_points(base_f, xl):
            pts, o = [], 0
            for k in range(arity):
                pts.append(mans[k].exp(base_f[k][:ptdims[k]],
                                       xl[o:o + tdofs[k]]))
                o += tdofs[k]
            return pts

        if g.mix is None:
            def res_one(model, meas, sqi, base_f, xl):
                def res(xl_):
                    return sqi @ model.residual(meas,
                                                *local_points(base_f, xl_))
                if with_jac:
                    return res(xl), jax.jacfwd(res)(xl)
                return res(xl)

            return jax.vmap(res_one)(g.models, g.meas, g.sqrt_inv, base,
                                     xloc)

        w, mus, sqis = g.mix

        def res_mix(model, base_f, xl, wrow, murow, sqirow):
            def res(xl_):
                args = local_points(base_f, xl_)

                def comp(mu_k, sqi_k):
                    return sqi_k @ model.residual(mu_k, *args)

                rs = jax.vmap(comp)(murow, sqirow)        # (C, z)
                score = 0.5 * jnp.sum(rs * rs, axis=-1) - jnp.log(
                    jnp.maximum(wrow, 1e-30))
                return rs[jnp.argmin(score)]

            if with_jac:
                return res(xl), jax.jacfwd(res)(xl)
            return res(xl)

        return jax.vmap(res_mix)(g.models, base, xloc, w, mus, sqis)

    # -- stacked whitened residual ---------------------------------------
    def residuals(self, x: jnp.ndarray, p0s=None) -> jnp.ndarray:
        p0s = self._p0_stacked() if p0s is None else p0s
        outs = [self._group_res(g, x, p0s, with_jac=False).reshape(-1)
                for g in self.groups]
        return jnp.concatenate(outs) if outs else jnp.zeros((0,))

    def res_jac(self, x: jnp.ndarray, p0s=None):
        """Full (r, J) from per-group local jacobians.

        Rows are contiguous per group (plain concatenation); columns place
        via a one-hot matmul — TPU-friendly MXU work instead of scatter ops
        (XLA scatter compiles pathologically slowly on TPU)."""
        if p0s is None:
            p0s = self._p0_stacked()
        D = self.total_dof
        rs, Js = [], []
        for g in self.groups:
            r, J = self._group_res(g, x, p0s, with_jac=True)
            S = jax.nn.one_hot(g.col_ids, D, dtype=J.dtype)  # (F, local, D)
            Jg = jnp.einsum("fzl,fld->fzd", J, S)
            rs.append(r.reshape(-1))
            Js.append(Jg.reshape(-1, D))
        if not rs:
            return jnp.zeros((0,)), jnp.zeros((0, D))
        return jnp.concatenate(rs), jnp.concatenate(Js)

    # -- LM solve ---------------------------------------------------------
    def solve(self, x0: Optional[jnp.ndarray] = None, max_iters: int = 50,
              relinearize: int = 2, lam0: float = 1e-4,
              tol: float = 1e-8):
        """Retract-and-relinearize rounds around one fully jitted step.

        The problem itself is a registered pytree, so the jitted step/cov
        functions are *shared across all problems with the same structure*
        (per-clique sweeps and autoinit reuse one compilation instead of
        retracing per clique)."""
        x = jnp.zeros((self.total_dof,)) if x0 is None else x0
        p0s = self._p0_stacked()

        cost = jnp.inf
        for _ in range(max(relinearize, 1)):
            p0s, cost = _solve_step(self, x, p0s, max_iters=max_iters,
                                    lam0=lam0, tol=tol)
            x = jnp.zeros_like(x)

        # write back linearization points
        self.p0 = [p0s[i, :m.point_dim]
                   for i, m in enumerate(self.manifolds)]
        cov = _cov_step(self, p0s)
        return list(self.p0), cov, float(cost)


# ---------------------------------------------------------------------------
# pytree registration: problems with identical structure (same groups/
# manifolds/shapes) share jit compilations of the solver steps below
# ---------------------------------------------------------------------------

def _group_flatten(g: _Group):
    return ((g.models, g.meas, g.sqrt_inv, g.mix),
            (g.ptdims, g.tdofs, g.arg_manifolds, g.row_base,
             tuple(map(tuple, np.asarray(g.var_slots))),
             tuple(map(tuple, np.asarray(g.col_ids)))))


def _group_unflatten(aux, ch):
    g = object.__new__(_Group)
    g.models, g.meas, g.sqrt_inv, g.mix = ch
    (g.ptdims, g.tdofs, g.arg_manifolds, g.row_base,
     slots, cols) = aux
    g.var_slots = np.asarray(slots, np.int32)
    g.col_ids = np.asarray(cols, np.int32)
    return g


jax.tree_util.register_pytree_node(_Group, _group_flatten, _group_unflatten)


def _prob_flatten(p: "ParametricProblem"):
    children = (p.groups, p.p0)
    aux = (p.manifolds if isinstance(p.manifolds, tuple)
           else tuple(p.manifolds),
           tuple(p.dofs), tuple(int(o) for o in p.offsets), p.total_dof,
           p.n_residuals, tuple(int(i) for i in p.free_idx))
    return children, aux


def _prob_unflatten(aux, ch):
    p = object.__new__(ParametricProblem)
    p.groups, p.p0 = ch
    manifolds, dofs, offsets, total_dof, n_res, free = aux
    p.free_idx = np.asarray(free, np.int64)
    p.manifolds = list(manifolds)
    p.dofs = list(dofs)
    p.offsets = np.asarray(offsets)
    p.total_dof = total_dof
    p.n_residuals = n_res
    # host-only fields are absent inside traced code
    p.fg = None
    p.var_labels = None
    p.slot = None
    p.solve_key = None
    return p


jax.tree_util.register_pytree_node(ParametricProblem, _prob_flatten,
                                   _prob_unflatten)


@functools.partial(jax.jit, static_argnames=("max_iters", "lam0", "tol"))
def _solve_step(prob: "ParametricProblem", x: jnp.ndarray, p0s: jnp.ndarray,
                max_iters: int = 50, lam0: float = 1e-4, tol: float = 1e-8):
    x, cost = _lm_core(prob, x, p0s, max_iters, lam0, tol)
    return prob._retract_stacked(x, p0s), cost


@jax.jit
def _cov_step(prob: "ParametricProblem", p0s: jnp.ndarray):
    zero = jnp.zeros((prob.total_dof,))
    _, J = prob.res_jac(zero, p0s)
    S = jax.nn.one_hot(prob.free_idx, prob.total_dof, dtype=J.dtype)
    Jf = J @ S.T
    H = Jf.T @ Jf
    cov_free = jnp.linalg.inv(H + 1e-8 * jnp.eye(H.shape[0]))
    # place the free block by one-hot matmuls — a 2-D scatter here costs
    # minutes of TPU compile time (same pathology as the jacobian assembly)
    return S.T @ cov_free @ S


def _lm_core(prob: ParametricProblem, x0: jnp.ndarray, p0s: jnp.ndarray,
             max_iters: int, lam0: float, tol: float):
    """Damped GN/LM with multiplicative damping adaptation (the reference's
    Manopt.LevenbergMarquardt! role, ParametricManopt.jl:307-377)."""

    free = prob.free_idx
    # one-hot selector: scatters/gathers by index arrays compile
    # pathologically on TPU — matmul forms replace them throughout
    S = jax.nn.one_hot(free, prob.total_dof)          # (f, D)

    def cost(x):
        r = prob.residuals(x, p0s)
        return 0.5 * jnp.sum(r * r)

    def body(carry):
        x, lam, c, it, done = carry
        r, J = prob.res_jac(x, p0s)
        Jf = J @ S.T
        g = Jf.T @ r
        H = Jf.T @ Jf
        step = jnp.linalg.solve(
            H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-8)), g)
        x_new = x - step @ S
        c_new = cost(x_new)
        improve = c_new < c
        x = jnp.where(improve, x_new, x)
        lam = jnp.where(improve, jnp.maximum(lam * 0.3, 1e-10), lam * 8.0)
        done = jnp.abs(c - c_new) < tol * jnp.maximum(c, 1.0)
        return (x, lam, jnp.where(improve, c_new, c), it + 1, done)

    def cond(carry):
        _, lam, _, it, done = carry
        return (it < max_iters) & (~done) & (lam < 1e8)

    x, _, c, _, _ = jax.lax.while_loop(
        cond, body, (x0, jnp.asarray(lam0), cost(x0), 0, False))
    return x, c


# ---------------------------------------------------------------------------
# public API (reference solveGraphParametric!, solveConditionalsParametric)
# ---------------------------------------------------------------------------

def _write_back(fg: FactorGraph, prob: ParametricProblem, points, cov,
                labels: Optional[Sequence[str]] = None) -> Dict[str, dict]:
    out = {}
    labels = set(labels or prob.var_labels)
    for i, v in enumerate(prob.var_labels):
        if v not in labels:
            continue
        var = fg.var(v)
        var.parametric_point = points[i]
        s = int(prob.offsets[i])
        e = int(prob.offsets[i + 1])
        var.parametric_cov = cov[s:e, s:e]
        var.ppe["parametric"] = {"mean": points[i], "max": points[i],
                                 "suggested": points[i]}
        out[v] = {"point": points[i], "cov": var.parametric_cov}
    return out


def solve_graph_parametric(fg: FactorGraph, max_iters: int = 50,
                           relinearize: int = 2,
                           init_from_belief: bool = True) -> Dict[str, dict]:
    """Full-graph batch parametric solve (reference solveGraphParametric! =
    RLM entry, ParametricManopt.jl:588-613)."""
    prob = ParametricProblem(fg)
    points, cov, cost = prob.solve(max_iters=max_iters,
                                   relinearize=relinearize)
    result = _write_back(fg, prob, points, cov)
    result["_cost"] = cost
    return result


def solve_conditionals_parametric(fg: FactorGraph,
                                  frontals: Sequence[str],
                                  separators: Sequence[str] = (),
                                  max_iters: int = 50) -> Dict[str, dict]:
    """Solve ``frontals`` with ``separators`` pinned (reference
    solveConditionalsParametric, ParametricUtils.jl:655-721)."""
    labels = list(frontals) + [s for s in separators if s not in frontals]
    factors = [fl for fl in fg.lsf()
               if all(v in set(labels) for v in fg.factor(fl).variables)
               and any(v in set(frontals) for v in fg.factor(fl).variables)]
    prob = ParametricProblem(fg, variables=labels, factors=factors,
                             frozen=tuple(separators))
    points, cov, cost = prob.solve(max_iters=max_iters)
    result = _write_back(fg, prob, points, cov, labels=frontals)
    result["_cost"] = cost
    return result


def autoinit_parametric(fg: FactorGraph, max_iters: int = 50) -> None:
    """Initialize parametric points variable-by-variable in topological
    order from priors (reference autoinitParametric!,
    ParametricManopt.jl:497-580)."""
    pending = [v for v in fg.ls() if fg.var(v).parametric_point is None]
    guard = 0
    while pending and guard < len(fg.ls()) + 2:
        guard += 1
        progressed = []
        for v in pending:
            nbr_fs = fg.factors_of(v)
            usable = []
            for fl in nbr_fs:
                f = fg.factor(fl)
                if isinstance(f.model, (MetaPrior, GenericMarginal)):
                    continue
                others = [o for o in f.variables if o != v]
                if all(fg.var(o).parametric_point is not None
                       for o in others):
                    usable.append(fl)
            if not usable:
                continue
            seps = sorted({o for fl in usable
                           for o in fg.factor(fl).variables if o != v})
            if not any(len(fg.factor(fl).variables) == 1 for fl in usable) \
                    and not seps:
                continue
            solve_conditionals_parametric(fg, [v], seps, max_iters=max_iters)
            progressed.append(v)
        if not progressed:
            break
        pending = [v for v in pending if v not in progressed]
