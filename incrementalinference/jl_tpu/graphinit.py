"""Variable auto-initialization from factor neighborhoods.

Reference: src/services/GraphInit.jl — factorCanInitFromOtherVars (:61-114),
doautoinit! (:132-199), initVariable! (:291-410), initAll! (:495-556),
ensureSolvable! (:469-485).
"""

from __future__ import annotations

import logging

import jax.numpy as jnp

logger = logging.getLogger(__name__)

from .beliefs import Belief, LazyPPE
from .models.factors import MetaPrior, GenericMarginal
from .ops.graphops import propagate_belief

__all__ = ["factor_can_init", "doautoinit", "init_variable", "init_all",
           "reset_initial_values", "ensure_solvable"]


def factor_can_init(fg, factor_label: str, target: str,
                    solve_key: str = "default") -> bool:
    """Can ``factor`` contribute an init proposal for ``target``?  All other
    connected variables must already be initialized (reference
    factorCanInitFromOtherVars, GraphInit.jl:61-114; multihypo carve-out:
    an uncertain sibling does not need init when solving a certain var —
    issue #427)."""
    f = fg.factor(factor_label)
    if isinstance(f.model, (MetaPrior, GenericMarginal)):
        return False
    if target not in f.variables:
        return False
    for i, vl in enumerate(f.variables):
        if vl == target:
            continue
        if fg.var(vl).is_initialized(solve_key):
            continue
        # multihypo carve-out: uninitialized *uncertain* siblings are allowed
        if f.multihypo is not None and f.multihypo[i] < 1.0 - 1e-9:
            continue
        return False
    return True


def doautoinit(fg, label: str, solve_key: str = "default") -> bool:
    """Initialize ``label`` from its usable neighbor factors if possible
    (reference doautoinit!, GraphInit.jl:132-199)."""
    v = fg.var(label)
    if v.is_initialized(solve_key):
        return True
    usable = [fl for fl in fg.factors_of(label)
              if factor_can_init(fg, fl, label, solve_key)]
    if not usable:
        return False
    belief, ipc = propagate_belief(fg, label, usable, solve_key=solve_key)
    fg.set_belief(label, belief.points, solve_key=solve_key,
                  bw=belief.bw, ipc=ipc, initialized=True)
    v.ppe[solve_key] = LazyPPE(v.manifold, belief)
    # preserve the init snapshot under the :graphinit solve key
    fg.set_belief(label, belief.points, solve_key="graphinit",
                  bw=belief.bw, ipc=ipc, initialized=True)
    return True


def init_variable(fg, label: str, value, solve_key: str = "default",
                  bw=None) -> Belief:
    """Manual initialization from points / belief / distribution
    (reference initVariable!, GraphInit.jl:291-410)."""
    v = fg.var(label)
    if isinstance(value, Belief):
        pts = value.points
        bw = value.bw
    elif hasattr(value, "sample"):                     # a Distribution
        pts = value.sample(fg.next_key(), v.N)
    else:
        pts = jnp.asarray(value, jnp.float32)
        if pts.ndim == 1:
            pts = jnp.broadcast_to(pts, (v.N,) + pts.shape)
    b = fg.set_belief(label, pts, solve_key=solve_key, bw=bw,
                      initialized=True)
    v.ppe[solve_key] = LazyPPE(v.manifold, b)
    return b


def reset_initial_values(fg, solve_key: str = "default",
                         src_key: str = "graphinit") -> None:
    """Restore beliefs from the :graphinit snapshot (reference
    resetInitialValues!, GraphInit.jl)."""
    for lbl, v in fg.variables.items():
        if src_key in v.beliefs:
            b = v.beliefs[src_key]
            fg.set_belief(lbl, b.points, solve_key=solve_key, bw=b.bw,
                          ipc=b.ipc, initialized=True)


def ensure_solvable(fg, solvable_target: int = 1,
                    solvable_fallback: int = 0) -> list:
    """Demote solvable variables with no connected solvable factor to
    ``solvable_fallback`` so tree solves skip them (reference
    ensureSolvable!, GraphInit.jl:469-485).  Returns the demoted labels.

    Variables demoted HERE are remembered and re-promoted automatically
    once they gain a solvable factor (a landmark declared before its first
    sighting must re-enter the solve when the sighting arrives; the
    demotion was ours, not the user's)."""
    demoted = getattr(fg, "_auto_demoted", set())
    for lbl in list(demoted):
        v = fg.variables.get(lbl)
        if v is None:
            demoted.discard(lbl)
            continue
        if v.solvable == solvable_fallback and any(
                fg.factor(fl).solvable >= solvable_target
                for fl in fg.factors_of(lbl)):
            v.solvable = solvable_target
            demoted.discard(lbl)
    blank = []
    for lbl, v in fg.variables.items():
        if v.solvable != solvable_target:
            continue
        has_fact = any(fg.factor(fl).solvable >= solvable_target
                       for fl in fg.factors_of(lbl))
        if not has_fact:
            v.solvable = solvable_fallback
            blank.append(lbl)
            demoted.add(lbl)
    fg._auto_demoted = demoted
    if blank:
        logger.warning("solve disallows solvable variables without any "
                       "connected solvable factors -- forcing solvable=0 "
                       "on %s", blank)
    return blank


def init_all(fg, solve_key: str = "default", max_passes: int = 10) -> bool:
    """Fixed-point init loop over all variables until no change
    (reference initAll!, GraphInit.jl:495-556, max 10 passes)."""
    for _ in range(max_passes):
        changed = False
        for lbl in fg.ls():
            if not fg.var(lbl).is_initialized(solve_key):
                if doautoinit(fg, lbl, solve_key=solve_key):
                    changed = True
        if all(fg.var(l).is_initialized(solve_key) for l in fg.ls()):
            return True
        if not changed:
            break
    return all(fg.var(l).is_initialized(solve_key) for l in fg.ls())
