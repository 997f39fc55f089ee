"""Structural/statistical comparison helpers.

Reference: src/services/CompareUtils.jl (compare overloads used throughout
the test suite).
"""

from __future__ import annotations

import numpy as np

__all__ = ["compare_beliefs", "compare_variables", "compare_graphs"]


def compare_beliefs(a, b, tol: float = 1e-5) -> bool:
    return (a.points.shape == b.points.shape
            and bool(np.allclose(np.asarray(a.points), np.asarray(b.points),
                                 atol=tol))
            and bool(np.allclose(np.asarray(a.bw), np.asarray(b.bw),
                                 atol=tol)))


def compare_variables(va, vb, tol: float = 1e-5) -> bool:
    if va.label != vb.label or va.vartype != vb.vartype:
        return False
    if set(va.beliefs) != set(vb.beliefs):
        return False
    return all(compare_beliefs(va.beliefs[k], vb.beliefs[k], tol)
               for k in va.beliefs)


def compare_graphs(fa, fb, tol: float = 1e-5) -> bool:
    if fa.ls() != fb.ls() or fa.lsf() != fb.lsf():
        return False
    if not all(compare_variables(fa.var(v), fb.var(v), tol)
               for v in fa.ls()):
        return False
    for fl in fa.lsf():
        x, y = fa.factor(fl), fb.factor(fl)
        if x.variables != y.variables or type(x.model) is not type(y.model):
            return False
        if x.multihypo != y.multihypo or x.nullhypo != y.nullhypo:
            return False
    return True
