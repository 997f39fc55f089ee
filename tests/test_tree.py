"""Symbolic/tree layer tests (reference testJunctionTreeConstruction.jl,
testBayesTreeiSAM2Example.jl, testCcolamdOrdering.jl analogues)."""

import numpy as np

from incrementalinference.jl_tpu.canonical import (generate_caesar_ring1d,
                                                   generate_kaess,
                                                   generate_test_symbolic)
from incrementalinference.jl_tpu.tree import (build_bayes_net, build_tree,
                                              build_tree_reset,
                                              get_elimination_order)
from incrementalinference.jl_tpu.tree.bayestree import CliqStatus


def test_kaess_isam2_worked_example():
    """Paper ordering [l1,l2,x1,x2,x3] must give the iSAM2 paper tree:
    root (x3,x2), children (x1,l1 | x2) and (l2 | x3)."""
    fg = generate_kaess()
    tree = build_tree(fg, order=["l1", "l2", "x1", "x2", "x3"])
    assert tree.num_cliques() == 3
    root = tree.cliques[tree.root_ids[0]]
    assert set(root.frontals) == {"x2", "x3"}
    kids = {tuple(sorted(c.frontals)): c for c in tree.cliques.values()
            if c.parent is not None}
    assert ("l1", "x1") in kids and kids[("l1", "x1")].separator == ["x2"]
    assert ("l2",) in kids and kids[("l2",)].separator == ["x3"]


def test_elimination_order_covers_all():
    fg = generate_test_symbolic()
    for method in ("qr", "ccolamd"):
        order = get_elimination_order(fg, method=method)
        assert sorted(order) == sorted(fg.ls())


def test_constrained_ordering_puts_constraints_last():
    fg = generate_test_symbolic()
    order = get_elimination_order(fg, method="ccolamd",
                                  constraints=["x1", "x2"])
    assert order[-2:] in (["x1", "x2"], ["x2", "x1"])


def test_bayes_net_separators_consistent():
    fg = generate_caesar_ring1d()
    order = get_elimination_order(fg)
    conds = build_bayes_net(fg, order)
    eliminated = set()
    for c in conds:
        # separators only contain not-yet-eliminated variables
        assert not (set(c.separator) & eliminated)
        eliminated.add(c.var)
    assert len(conds) == len(fg.ls())


def test_every_factor_assigned_once():
    fg = generate_caesar_ring1d()
    tree = build_tree(fg)
    assigned = [fl for c in tree.cliques.values() for fl in c.potentials]
    assert sorted(assigned) == sorted(fg.lsf())


def test_frontals_partition_variables():
    fg = generate_test_symbolic()
    tree = build_tree(fg)
    frontals = [v for c in tree.cliques.values() for v in c.frontals]
    assert sorted(frontals) == sorted(fg.ls())
    # running-intersection sanity: separator ⊆ some ancestor's vars
    for c in tree.cliques.values():
        if c.parent is not None:
            p = tree.cliques[c.parent]
            assert set(c.separator) <= set(p.frontals) | set(p.separator)


def test_levels_root_first():
    fg = generate_caesar_ring1d()
    tree = build_tree(fg)
    levels = tree.levels()
    assert set(levels[0]) == set(tree.root_ids)
    seen = set()
    for lvl in levels:
        for cid in lvl:
            par = tree.cliques[cid].parent
            assert par is None or par in seen
        seen |= set(lvl)


def test_recycling_marks_unchanged_cliques():
    fg = generate_kaess()
    order = ["l1", "l2", "x1", "x2", "x3"]
    t1 = build_tree(fg, order=order)
    for c in t1.cliques.values():
        c.status = CliqStatus.UPSOLVED
    t2 = build_tree_reset(fg, order=order, old_tree=t1)
    assert all(c.is_recycled for c in t2.cliques.values())
    # adding a factor invalidates the touched clique (and only consistent
    # subtrees stay recycled)
    from incrementalinference.jl_tpu import LinearRelative, Normal
    fg.add_factor(["x1", "x2"], LinearRelative(Normal(0, 1)), graphinit=False)
    t3 = build_tree_reset(fg, order=order, old_tree=t1)
    changed = [c for c in t3.cliques.values() if not c.is_recycled]
    assert len(changed) >= 1


def test_deep_chain_tree_build_no_recursion_limit():
    """Chain graphs make trees thousands of levels deep — traversals must
    be iterative (a 2250-variable chain overflows Python's default
    recursion limit with recursive post-order/levels)."""
    from incrementalinference.jl_tpu.canonical import generate_line_step
    from incrementalinference.jl_tpu.tree.bayestree import build_tree_reset
    fg = generate_line_step(3000, graphinit=False)
    tree = build_tree_reset(fg)
    assert tree.num_cliques() > 1000
    lv = tree.levels()
    assert sum(len(l) for l in lv) == tree.num_cliques()
    # every solvable factor assigned to exactly one clique
    npots = sum(len(c.potentials) for c in tree.cliques.values())
    assert npots == len(fg.lsf())
    # incremental rebuild walks the recycling subtree check — must also be
    # iterative (regressed separately from the build-path traversals)
    tree2 = build_tree_reset(fg, old_tree=tree)
    assert tree2.num_cliques() == tree.num_cliques()
