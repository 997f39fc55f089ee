"""Bayes (junction) tree assembly and clique bookkeeping.

Reference: src/services/JunctionTreeUtils.jl — buildTree!/newPotential
(Kaess Bayes-tree Alg. 2, :357-495), buildTreeFromOrdering! (:766-810),
setCliqPotentials! (:1045-1082), compCliqAssocMatrices!/setCliqMCIDs!
Gibbs partitioning (:1294-1523), clique recycling (attemptTreeSimilarClique,
:1801-1849).

The reference wires unbuffered channels between clique Tasks; here the tree
is a static DAG whose *levels* drive the level-synchronous scheduler
(parallel/scheduler.py) — SURVEY.md §7.6.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from enum import Enum
from typing import Dict, List, Optional, Sequence, Tuple

from .bayesnet import Conditional, build_bayes_net
from .ordering import get_elimination_order

__all__ = ["CliqStatus", "Clique", "BayesTree", "build_tree",
           "build_tree_reset"]


class CliqStatus(str, Enum):
    """Reference CliqStatus enum (src/entities/BeliefTypes.jl:8)."""

    NULL = "NULL"
    NO_INIT = "NO_INIT"
    INITIALIZED = "INITIALIZED"
    UPSOLVED = "UPSOLVED"
    MARGINALIZED = "MARGINALIZED"
    DOWNSOLVED = "DOWNSOLVED"
    UPRECYCLED = "UPRECYCLED"
    ERROR_STATUS = "ERROR_STATUS"


@dataclass
class Clique:
    """Tree clique payload (reference BayesTreeNodeData,
    src/entities/CliqueTypes.jl:85-115)."""

    cid: int
    frontals: List[str]
    separator: List[str]
    parent: Optional[int] = None
    children: List[int] = field(default_factory=list)
    potentials: List[str] = field(default_factory=list)
    status: CliqStatus = CliqStatus.NULL
    is_recycled: bool = False
    is_marginalized: bool = False
    # Gibbs partitions (reference setCliqMCIDs!, JunctionTreeUtils.jl:1352-1523)
    direct_vars: List[str] = field(default_factory=list)
    iter_vars: List[str] = field(default_factory=list)
    msgskip_vars: List[str] = field(default_factory=list)

    @property
    def all_vars(self) -> List[str]:
        return self.frontals + self.separator

    def signature(self) -> Tuple:
        """Recycling identity: frontals + separator + potentials
        (reference attemptTreeSimilarClique match rule)."""
        return (tuple(sorted(self.frontals)), tuple(sorted(self.separator)),
                tuple(sorted(self.potentials)))


class BayesTree:
    """Reference MetaBayesTree (src/entities/JunctionTreeTypes.jl:13-21)."""

    def __init__(self):
        self.cliques: Dict[int, Clique] = {}
        self.frontal_to_clique: Dict[str, int] = {}
        self.elimination_order: List[str] = []
        self.conditionals: List[Conditional] = []
        self.build_time: float = 0.0
        # previous-solve down-message summaries keyed by clique signature —
        # consulted by the wildfire down-solve gate (SolverParams.wildfire_tol)
        self.down_cache: Dict[Tuple, dict] = {}
        # up/down messages retained from the last sweep (reference
        # getTreeCliqUpMsgsAll / getCliqDownMsgsAfterDownSolve introspection)
        self.up_msgs: Dict[int, object] = {}
        self.down_msgs: Dict[int, object] = {}

    @property
    def root_ids(self) -> List[int]:
        return [c.cid for c in self.cliques.values() if c.parent is None]

    def _euler_intervals(self):
        """Pre-order (tin, tout) intervals per clique, computed lazily once
        per tree: descendant tests become two dict lookups instead of a
        subtree walk (the walk made every down-solve O(subtree) in host
        time — O(depth²) per sweep on chain graphs)."""
        iv = getattr(self, "_euler_iv", None)
        if iv is not None and self._euler_n == len(self.cliques):
            return iv
        tin: Dict[int, int] = {}
        tout: Dict[int, int] = {}
        t = 0
        for r in sorted(self.root_ids):
            stack = [(r, False)]
            while stack:
                cid, done = stack.pop()
                if done:
                    tout[cid] = t - 1
                    continue
                tin[cid] = t
                t += 1
                stack.append((cid, True))
                stack.extend((ch, False)
                             for ch in sorted(self.cliques[cid].children))
        self._euler_iv = (tin, tout)
        self._euler_n = len(self.cliques)
        return self._euler_iv

    def is_descendant_frontal(self, var: str, cid: int) -> bool:
        """True when ``var`` is a frontal of a STRICT descendant of
        ``cid`` (each variable is frontal in exactly one clique)."""
        home = self.frontal_to_clique.get(var)
        if home is None or home == cid:
            return False
        tin, tout = self._euler_intervals()
        th = tin.get(home)
        return th is not None and tin[cid] < th <= tout[cid]

    def clique(self, cid: int) -> Clique:
        return self.cliques[cid]

    def clique_of(self, frontal: str) -> Clique:
        return self.cliques[self.frontal_to_clique[frontal]]

    def children(self, cid: int) -> List[Clique]:
        return [self.cliques[c] for c in self.cliques[cid].children]

    def levels(self) -> List[List[int]]:
        """Cliques grouped by depth (root level first) — the static
        level-synchronous schedule for the up/down sweeps."""
        depth: Dict[int, int] = {}
        # explicit stack: chain graphs make trees thousands of levels deep,
        # far past Python's recursion limit
        stack = [(r, 0) for r in self.root_ids]
        while stack:
            cid, d = stack.pop()
            depth[cid] = d
            stack.extend((ch, d + 1) for ch in self.cliques[cid].children)
        out: List[List[int]] = []
        for cid, d in depth.items():
            while len(out) <= d:
                out.append([])
            out[d].append(cid)
        return out

    def num_cliques(self) -> int:
        return len(self.cliques)

    def is_root(self, cid: int) -> bool:
        """Reference isRoot(tree, CliqueId) (test/testTreeFunctions.jl:25)."""
        return self.cliques[cid].parent is None

    def delete_clique(self, cid: int) -> Clique:
        """Remove a clique; its children become roots and its frontals are
        unindexed (reference deleteClique!,
        test/testTreeFunctions.jl:30-36)."""
        cl = self.cliques.pop(cid)
        for ch in cl.children:
            self.cliques[ch].parent = None
        if cl.parent is not None and cl.parent in self.cliques:
            par = self.cliques[cl.parent]
            par.children = [c for c in par.children if c != cid]
        for f in cl.frontals:
            self.frontal_to_clique.pop(f, None)
        return cl

    def __repr__(self):
        return (f"BayesTree({len(self.cliques)} cliques, "
                f"depth={len(self.levels())})")


def _assign_potentials(fg, tree: BayesTree) -> None:
    """Assign each factor to exactly one clique: post-order (leaves first),
    factor goes to the first clique whose variables cover it and whose
    frontals touch it (reference setCliqPotentials!,
    JunctionTreeUtils.jl:1045-1082)."""
    used = set()

    def visit(cl) -> None:
        cvars = set(cl.all_vars)
        frontals = set(cl.frontals)
        for vl in cl.frontals:
            for fl in fg.factors_of(vl):
                if fl in used:
                    continue
                f = fg.factor(fl)
                if f.solvable <= 0:
                    continue
                if set(f.variables) <= cvars and \
                        any(v in frontals for v in f.variables):
                    cl.potentials.append(fl)
                    used.add(fl)

    # iterative post-order (leaves first) — deep chain trees overflow the
    # Python recursion limit otherwise
    stack = [(r, False) for r in tree.root_ids]
    while stack:
        cid, expanded = stack.pop()
        if expanded:
            visit(tree.cliques[cid])
            continue
        stack.append((cid, True))
        stack.extend((ch, False) for ch in tree.cliques[cid].children)


def _partition_gibbs_vars(fg, tree: BayesTree) -> None:
    """Per-clique Gibbs partitions: separator vars with no in-clique factor
    are message pass-throughs; frontal/separator vars touched by ≤1 potential
    solve once ("direct"); the rest iterate, sorted by potential count
    (reference setCliqMCIDs! semantics, JunctionTreeUtils.jl:1352-1523)."""
    for cl in tree.cliques.values():
        counts = {v: 0 for v in cl.all_vars}
        for fl in cl.potentials:
            for v in fg.factor(fl).variables:
                if v in counts:
                    counts[v] += 1
        # child messages also constrain their separator vars
        for ch in tree.children(cl.cid):
            for v in ch.separator:
                if v in counts:
                    counts[v] += 1
        cl.direct_vars, cl.iter_vars, cl.msgskip_vars = [], [], []
        for v in cl.frontals:
            (cl.direct_vars if counts[v] <= 1 else cl.iter_vars).append(v)
        for v in cl.separator:
            if counts[v] == 0:
                cl.msgskip_vars.append(v)
            elif counts[v] <= 1:
                cl.direct_vars.append(v)
            else:
                cl.iter_vars.append(v)
        cl.iter_vars.sort(key=lambda v: (-counts[v], v))


def build_tree(fg, order: Optional[Sequence[str]] = None,
               method: Optional[str] = None) -> BayesTree:
    """Elimination → Bayes net → Bayes tree + potentials + partitions
    (reference buildTreeFromOrdering!, JunctionTreeUtils.jl:766-810)."""
    t0 = time.time()
    if order is None:
        order = get_elimination_order(fg, method or fg.params.ordering)
    order = list(order)
    conditionals = build_bayes_net(fg, order)
    cond_of = {c.var: c for c in conditionals}
    elim_index = {v: i for i, v in enumerate(order)}

    tree = BayesTree()
    tree.elimination_order = order
    tree.conditionals = conditionals
    next_id = [0]

    def new_clique(frontal: str, sep: List[str],
                   parent: Optional[int]) -> Clique:
        next_id[0] += 1
        cl = Clique(cid=next_id[0], frontals=[frontal], separator=list(sep),
                    parent=parent)
        tree.cliques[cl.cid] = cl
        tree.frontal_to_clique[frontal] = cl.cid
        if parent is not None:
            tree.cliques[parent].children.append(cl.cid)
        return cl

    # Kaess Alg. 2: reverse elimination order (JunctionTreeUtils.jl:481-495)
    for var in reversed(order):
        sep = cond_of[var].separator
        if not sep:
            new_clique(var, [], None)
            continue
        # parent clique holds the first-eliminated separator var as frontal
        fel = min(sep, key=lambda s: elim_index[s])
        cp = tree.cliques[tree.frontal_to_clique[fel]]
        if set(cp.all_vars) == set(sep):
            # conditional fits: append var as a frontal of cp
            cp.frontals.append(var)
            tree.frontal_to_clique[var] = cp.cid
        else:
            new_clique(var, sep, cp.cid)

    _assign_potentials(fg, tree)
    _partition_gibbs_vars(fg, tree)
    tree.build_time = time.time() - t0
    return tree


def build_tree_reset(fg, order: Optional[Sequence[str]] = None,
                     method: Optional[str] = None,
                     old_tree: Optional[BayesTree] = None) -> BayesTree:
    """Rebuild the tree and mark recyclable cliques against ``old_tree``
    (reference buildTreeReset! + attemptTreeSimilarClique,
    JunctionTreeUtils.jl:908-937, :1801-1849)."""
    tree = build_tree(fg, order=order, method=method)
    if old_tree is not None:
        # carry forward only signatures still present in the new tree:
        # an unbounded copy would grow with every clique signature ever
        # seen across a long incremental session and pin the summaries'
        # device buffers forever
        live = {c.signature() for c in tree.cliques.values()}
        tree.down_cache = {
            sig: s
            for sig, s in getattr(old_tree, "down_cache", {}).items()
            if sig in live}
    if old_tree is not None and fg.params.incremental:
        old_by_sig = {c.signature(): c for c in old_tree.cliques.values()}
        for cl in tree.cliques.values():
            old = old_by_sig.get(cl.signature())
            if old is not None and old.status in (CliqStatus.UPSOLVED,
                                                  CliqStatus.DOWNSOLVED,
                                                  CliqStatus.UPRECYCLED,
                                                  CliqStatus.MARGINALIZED):
                cl.is_recycled = True
                cl.status = CliqStatus.UPRECYCLED
            if old is not None and old.is_marginalized:
                cl.is_marginalized = True
                cl.status = CliqStatus.MARGINALIZED

        # recycling only holds if the whole subtree below is recycled —
        # an up-message depends on every descendant's up-solve.  Iterative
        # post-order: deep chain trees overflow the recursion limit.
        stack = [(r, False) for r in tree.root_ids]
        while stack:
            cid, expanded = stack.pop()
            cl = tree.cliques[cid]
            if not expanded:
                stack.append((cid, True))
                stack.extend((ch, False) for ch in cl.children)
                continue
            ok = all(tree.cliques[ch].is_recycled
                     or tree.cliques[ch].is_marginalized
                     for ch in cl.children)
            if cl.is_recycled and not ok:
                cl.is_recycled = False
                cl.status = CliqStatus.NULL
    return tree
