"""Eager-dispatch budget regression tests.

On the tunneled TPU every EAGER op (apply_primitive outside jit) costs a
~50 us host round trip, so the warm solver sweeps are engineered to run
as a handful of jitted dispatches with NO eager ops in the hot path
(BASELINE.md round-4 'input-side batching': the parametric sweep once
hid ~2,100 eager expand_dims/concat dispatches in jnp.stack/tree_map —
0.4 s of a 0.68 s solve).  These tests pin that property on CPU, where
the same apply_primitive path runs: a regression that reintroduces eager
per-leaf/per-row work fails loudly instead of silently re-adding seconds
on hardware.
"""

import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Normal, Prior, initfg, solve_tree)
from incrementalinference.jl_tpu.config import SolverParams


class _EagerCounter:
    """Counts eager op applications OUTSIDE jitted programs.

    Two entry points cover jax 0.9's eager paths (verified by the control
    test below, which fails loudly if a jax upgrade moves them):

    - ``core.EvalTrace.process_primitive`` — every direct lax primitive
      bind under the ambient eval trace (concatenate, reshape, iota, …).
      Executions of already-compiled jitted programs never pass through
      it (they ride the C++ pjit fastpath), so warm solver dispatches are
      free; per-leaf eager plumbing is not.
    - ``jnp.ufunc.__call__`` — jnp arithmetic is wrapped in per-op jits
      whose *Python wrapper* runs per eager call (and once at user-jit
      trace time, which warm re-solves never reach).

    NOTE: jax._src.dispatch.apply_primitive, which this counter patched
    through round 4, stopped being interceptable (primitive impls capture
    it via functools.partial at definition time) — the old counter read 0
    vacuously on jax 0.9."""

    def __init__(self):
        import jax._src.core as _core
        import jax.numpy as _jnp
        assert hasattr(_core.EvalTrace, "process_primitive") and hasattr(
            _jnp.ufunc, "__call__"), (
            "eager entry points moved — update _EagerCounter")
        self._core = _core
        self._ufunc = _jnp.ufunc
        self._orig_pp = _core.EvalTrace.process_primitive
        self._orig_uc = _jnp.ufunc.__call__
        self.count = 0

    def __enter__(self):
        orig_pp, orig_uc = self._orig_pp, self._orig_uc

        def counted_pp(tr, prim, args, params):
            self.count += 1
            return orig_pp(tr, prim, args, params)

        def counted_uc(uf, *a, **k):
            self.count += 1
            return orig_uc(uf, *a, **k)

        self._core.EvalTrace.process_primitive = counted_pp
        self._ufunc.__call__ = counted_uc
        return self

    def __exit__(self, *exc):
        self._core.EvalTrace.process_primitive = self._orig_pp
        self._ufunc.__call__ = self._orig_uc
        return False


def test_eager_counter_sees_eager_ops():
    """Control: the counter must register known-eager work, so API drift
    that bypasses the patched entry point fails here instead of silently
    hollowing out the budget tests below."""
    import jax.numpy as jnp
    with _EagerCounter() as c:
        (jnp.arange(4.0) + 1.0).block_until_ready()
    assert c.count > 0, (
        "eager work bypassed both EvalTrace.process_primitive and "
        "jnp.ufunc.__call__ — the eager entry points moved again; "
        "re-bisect and update _EagerCounter")


def _wide_forest(params, branches=8):
    fg = initfg(params)
    for b in range(branches):
        root = f"x{b}_0"
        fg.add_variable(root, ContinuousScalar)
        fg.add_factor([root], Prior(Normal(float(b), 1.0)))
        prev = root
        for i in range(1, 3):
            v = f"x{b}_{i}"
            fg.add_variable(v, ContinuousScalar)
            fg.add_factor([prev, v], LinearRelative(Normal(1.0, 0.5)))
            prev = v
    return fg


def test_parametric_resolve_eager_budget():
    """A warm same-graph parametric re-solve must stay within a small
    fixed eager budget — the batched-LM inputs (leaf stacks, p0 buckets)
    and outputs (row unstacks, cov blocks) all ride jitted plans
    (solver.py:_batch_prep/_group_unstack, cliques.py:_finalize_fn)."""
    fg = _wide_forest(SolverParams(batch_cliques=False))
    solve_tree(fg, algorithm="parametric")        # warm plans + jits
    with _EagerCounter() as c:
        solve_tree(fg, algorithm="parametric")
    # measured count is 0 with the real (round-5) counter (2026-08-21,
    # after folding the per-group whitening pad-mask multiply into the
    # jitted _sqrt_inv_masked); the pre-batching count was ~60+ eager ops
    # per clique solve at this size.
    assert c.count <= 8, (
        f"warm parametric re-solve ran {c.count} eager dispatches — "
        "input/output batching regressed (see solver.py _batch_prep)")


def test_nonparametric_resolve_eager_budget():
    """The warm nonparametric sweep dispatches one fused chain program
    per clique; eager ops must not scale with factors x variables."""
    fg = _wide_forest(SolverParams(batch_cliques=False))
    solve_tree(fg)                                 # warm chain plans
    with _EagerCounter() as c:
        solve_tree(fg)
    # measured count is 0 with the real (round-5) counter (2026-08-21)
    assert c.count <= 8, (
        f"warm nonparametric re-solve ran {c.count} eager dispatches — "
        "the fused-chain path regressed (scheduler.py _gibbs_solve_chain)")


def test_parametric_resolve_matches_fresh():
    """The jitted stack/unstack plans must be value-transparent: a warm
    re-solve equals a fresh solve of an identical graph."""
    fg1 = _wide_forest(SolverParams(batch_cliques=False))
    solve_tree(fg1, algorithm="parametric")
    solve_tree(fg1, algorithm="parametric")        # re-solve path
    fg2 = _wide_forest(SolverParams(batch_cliques=False))
    solve_tree(fg2, algorithm="parametric")
    for v in fg1.ls():
        a = np.asarray(fg1.var(v).parametric_point)
        b = np.asarray(fg2.var(v).parametric_point)
        assert np.allclose(a, b, atol=1e-5), (v, a, b)
