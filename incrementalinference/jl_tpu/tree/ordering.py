"""Fill-reducing variable elimination orderings.

Reference: src/services/BayesNet.jl:19-60 (getEliminationOrder — QR
column-norm pivoting default, CCOLAMD constrained alternative via
ext/IncrInfrApproxMinDegreeExt.jl).  The native SuiteSparse CCOLAMD is
replaced by (a) pivoted QR on the dense incidence matrix (scipy/LAPACK — the
reference's default path uses the same LAPACK kernel) and (b) a constrained
greedy minimum-degree heuristic for the ``ccolamd``-style path, both host
code: ordering is tiny irregular work that has no business on the TPU
(SURVEY.md §7.5).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence

import numpy as np
import scipy.linalg

__all__ = ["get_elimination_order"]


def _incidence(fg, variables: List[str]):
    """Dense factor × variable incidence matrix."""
    col = {v: j for j, v in enumerate(variables)}
    fls = [f for f in fg.lsf() if fg.factor(f).solvable > 0]
    A = np.zeros((max(len(fls), 1), len(variables)), np.float64)
    for i, fl in enumerate(fls):
        for vl in fg.factor(fl).variables:
            if vl in col:
                A[i, col[vl]] = 1.0
    return A


def _qr_order(fg, variables: List[str]) -> List[str]:
    A = _incidence(fg, variables)
    # LAPACK dgeqp3 column pivoting (the reference's qr(A, Val(true)).p)
    _, _, p = scipy.linalg.qr(A, pivoting=True, mode="economic")
    return [variables[j] for j in p]


def _min_degree_order(fg, variables: List[str]) -> List[str]:
    """Greedy minimum-degree on the variable adjacency graph (the
    COLAMD-family heuristic re-implemented; constraints handled by caller)."""
    adj = {v: set() for v in variables}
    for fl in fg.lsf():
        vs = [v for v in fg.factor(fl).variables if v in adj]
        for a in vs:
            for b in vs:
                if a != b:
                    adj[a].add(b)
    order: List[str] = []
    remaining = set(variables)
    while remaining:
        # tie-break on label for determinism
        v = min(remaining, key=lambda x: (len(adj[x] & remaining), x))
        order.append(v)
        remaining.discard(v)
        # eliminate: connect neighbors (chordal fill)
        nbrs = adj[v] & remaining
        for a in nbrs:
            adj[a] |= nbrs - {a}
    return order


def get_elimination_order(fg, method: str = "qr",
                          constraints: Optional[Sequence[str]] = None,
                          variables: Optional[Iterable[str]] = None
                          ) -> List[str]:
    """Compute an elimination order over solvable variables.

    ``constraints`` are forced to the END of the order (eliminated last →
    near the tree root), matching the reference's CCOLAMD constraint use for
    fixed-lag and solve-in-order (BayesNet.jl:35-56).
    """
    variables = [v for v in (variables or fg.ls())
                 if fg.var(v).solvable > 0]
    constraints = [c for c in (constraints or []) if c in variables]

    if method in ("colamd", "ccolamd", "mindegree"):
        # native C++ constrained min-degree first (the reference's CCOLAMD
        # role); cmember groups: 0 = free, 1 = constrained-last
        from ..native import native_ccolamd
        idx = {v: i for i, v in enumerate(variables)}
        fvars = [[idx[v] for v in fg.factor(fl).variables if v in idx]
                 for fl in fg.lsf() if fg.factor(fl).solvable > 0]
        cmember = [1 if v in set(constraints) else 0 for v in variables]
        out = native_ccolamd(len(variables), fvars, cmember)
        if out is not None:
            return [variables[i] for i in out]

    free = [v for v in variables if v not in set(constraints)]
    if method == "qr":
        order = _qr_order(fg, free)
    elif method in ("colamd", "ccolamd", "mindegree"):
        order = _min_degree_order(fg, free)
    else:
        raise ValueError(f"unknown ordering method {method!r}")
    return order + list(constraints)
