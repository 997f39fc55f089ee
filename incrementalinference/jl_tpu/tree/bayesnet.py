"""Symbolic variable elimination → chordal Bayes net.

Reference: src/services/BayesNet.jl:139-189 (buildBayesNet! — eliminate in
order, form separators, insert GenericMarginal chain-rule placeholders).
Pure host code over labels; no numerics.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Sequence, Tuple

__all__ = ["Conditional", "build_bayes_net"]


@dataclass
class Conditional:
    """p(var | separator) with the factor labels consumed at elimination."""

    var: str
    separator: List[str]
    factors: List[str] = field(default_factory=list)


def build_bayes_net(fg, order: Sequence[str]) -> List[Conditional]:
    """Eliminate variables in ``order``; returns one conditional per variable.

    Chain-rule marginals (the reference's GenericMarginal insertions,
    BayesNet.jl:166-183) are tracked symbolically as extra "active sets" so
    later separators remain correct.
    """
    # active potential sets: factor label (or marginal id) -> variable set.
    # A factor only participates if ALL its variables are solvable — the
    # reference eliminates over the solvable subgraph (DFG solvable
    # filtering), and a factor touching a non-solvable variable would
    # otherwise drag that variable into separators while the elimination
    # order excludes it
    active: Dict[str, Tuple[str, ...]] = {}
    for fl in fg.lsf():
        f = fg.factor(fl)
        if f.solvable > 0 and all(fg.var(v).solvable > 0
                                  for v in f.variables):
            active[fl] = tuple(v for v in f.variables)

    conditionals: List[Conditional] = []
    eliminated = set()
    marg_count = 0

    for var in order:
        touching = [k for k, vs in active.items() if var in vs]
        sep: List[str] = []
        real_factors: List[str] = []
        for k in touching:
            for v in active[k]:
                if v != var and v not in eliminated and v not in sep:
                    sep.append(v)
            if not k.startswith("__marg"):
                real_factors.append(k)
                # mark consumed for getFactorsAmongVariablesOnly(unused=…)
                # (reference potentialused flag, BayesNet.jl:154-160)
                fg.factor(k).potential_used = True
            del active[k]
        conditionals.append(Conditional(var=var, separator=sep,
                                        factors=real_factors))
        eliminated.add(var)
        if sep:
            marg_count += 1
            active[f"__marg{marg_count}"] = tuple(sep)

    return conditionals
