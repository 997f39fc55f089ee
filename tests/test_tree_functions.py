"""Tree structure invariants: clique factor assignment (#458), subgraph
contents, delete-clique re-rooting, Kaess tree listing (reference
testCliqueFactors.jl, testTreeFunctions.jl)."""

import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Normal, Prior, SolverParams,
                                         build_tree, initfg, solve_tree)
from incrementalinference.jl_tpu.canonical import (generate_kaess,
                                                   generate_line_step)
from incrementalinference.jl_tpu.parallel.scheduler import \
    build_clique_subgraph


def _factor_by_vars(fg, *vars_):
    """Find the factor connecting exactly these variables."""
    want = set(vars_)
    for fl in fg.lsf():
        if set(fg.factor(fl).variables) == want:
            return fl
    raise KeyError(want)


def test_clique_factors_458_example1():
    """Factor-to-clique assignment on the #458 example 1 graph: frontals
    partition all variables; every factor lands in exactly one clique
    (reference testCliqueFactors.jl:9-97)."""
    fg = initfg()
    for v in ("x0", "x1", "x2", "x3", "x4", "l0", "l1"):
        fg.add_variable(v, ContinuousScalar)
    lc = lambda: LinearRelative(Normal(0.0, 1.0))      # noqa: E731
    for pair in (("x0", "x1"), ("x1", "x2"), ("x2", "x3"), ("x3", "x4"),
                 ("x0", "l0"), ("x2", "l0"), ("x0", "l1"), ("x2", "l1")):
        fg.add_factor(list(pair), lc(), graphinit=False)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)), graphinit=False)
    fg.add_factor(["l0"], Prior(Normal(0.0, 1.0)), graphinit=False)

    vo = ["x2", "x0", "l0", "x3", "x1", "l1", "x4"]
    tree = build_tree(fg, order=vo)

    # frontals partition the variable set (:45-52)
    all_frontals = [f for c in tree.cliques.values() for f in c.frontals]
    assert sorted(all_frontals) == sorted(fg.ls())

    # potentials partition the factor set (:93-96)
    all_pots = [p for c in tree.cliques.values() for p in c.potentials]
    assert sorted(all_pots) == sorted(fg.lsf())

    # the clique holding x0 carries the factors the reference lists (:63-67):
    # x0l0, x0l1, x0x1, x0-prior
    c3 = tree.clique_of("x0")
    expect = {_factor_by_vars(fg, "x0", "l0"), _factor_by_vars(fg, "x0", "l1"),
              _factor_by_vars(fg, "x0", "x1"), _factor_by_vars(fg, "x0")}
    assert expect <= set(c3.potentials)
    sub = build_clique_subgraph(fg, c3)
    assert expect <= set(sub.lsf())
    assert set(sub.ls()) == set(c3.frontals) | set(c3.separator)


def test_clique_factors_458_example2_partition():
    """#458 example 2: the three cliques split the factors disjointly
    (reference testCliqueFactors.jl:103-164)."""
    fg = initfg()
    for v in ("x0", "x1", "x2", "x3", "lm0", "lm3"):
        fg.add_variable(v, ContinuousScalar)
    lc = lambda: LinearRelative(Normal(0.0, 1.0))      # noqa: E731
    for pair in (("x0", "x1"), ("x1", "x2"), ("x2", "x3"),
                 ("x0", "lm0"), ("x1", "lm0"), ("x2", "lm3"),
                 ("x3", "lm3")):
        fg.add_factor(list(pair), lc(), graphinit=False)

    vo = ["x0", "x2", "x1", "lm3", "lm0", "x3"]
    tree = build_tree(fg, order=vo)

    pots = [sorted(c.potentials) for c in tree.cliques.values()]
    flat = [p for ps in pots for p in ps]
    assert sorted(flat) == sorted(fg.lsf())        # full cover
    assert len(flat) == len(set(flat))             # disjoint


def test_clique_subgraph_line_step():
    """LineStep(4) clique frontal/separator/potential content matches the
    reference fixture (testCliqueFactors.jl:166-206)."""
    fg = generate_line_step(4, landmark_priors_at=(0, 4))
    tree = build_tree(fg)
    # every clique subgraph contains exactly its frontals+separator and its
    # potential factors
    for cl in tree.cliques.values():
        sub = build_clique_subgraph(fg, cl)
        assert set(sub.ls()) == set(cl.frontals) | set(cl.separator)
        for p in cl.potentials:
            assert p in sub.lsf()
        # potentials only involve clique variables
        for p in cl.potentials:
            assert set(fg.factor(p).variables) <= set(cl.all_vars)


def test_delete_clique_reroots_children():
    """deleteClique! on the root makes each child a root; re-solve from the
    modified old tree still works (reference testTreeFunctions.jl:4-44)."""
    fg = generate_line_step(3, pose_every=1, landmark_every=3,
                            pose_priors_at=(), landmark_priors_at=(0,),
                            sight_distance=2,
                            params=SolverParams(N=75, graphinit=True))
    old_tree = solve_tree(fg)
    roots = old_tree.root_ids
    assert len(roots) == 1
    root = roots[0]
    assert old_tree.is_root(root)
    kids = [c.cid for c in old_tree.children(root)]

    old_tree.delete_clique(root)
    for k in kids:
        assert old_tree.is_root(k)
    assert set(old_tree.root_ids) == set(kids)

    tree = solve_tree(fg, old_tree=old_tree)   # recycle from pruned tree
    assert tree.num_cliques() >= 1
    for lbl in fg.ls():
        truth = float(lbl.lstrip("xlm"))
        p = np.asarray(fg.points(lbl)[:, 0])
        assert abs(p.mean() - truth) < 0.5, (lbl, p.mean())


def test_analysis_nnz_kaess_hand_values():
    """nnz metrics on the Kaess tree match the iSAM2-paper hand-calculated
    values (reference testAnalysisTools.jl:5-30)."""
    from incrementalinference.jl_tpu.tree.analysis import (nnz_clique,
                                                           nnz_frontals,
                                                           nnz_tree)
    for dim in range(1, 101):
        assert nnz_frontals(dim) == dim * (dim + 1) // 2

    fg = generate_kaess()
    tree = build_tree(fg, order=["l1", "l2", "x1", "x2", "x3"])
    by_front = {tuple(sorted(c.frontals)): c for c in tree.cliques.values()}
    # reference clique numbering: 1={x3,x2}, 2={x1,l1}, 3={l2}
    assert nnz_clique(by_front[("x2", "x3")]) == 3
    assert nnz_clique(by_front[("l1", "x1")]) == 5
    assert nnz_clique(by_front[("l2",)]) == 2
    assert nnz_tree(tree) == 10


def test_kaess_tree_listing():
    """Kaess tree with eo [l2,l1,x1,x2,x3]: root {x3,x2} with children
    {x1,l1} and {l2} (reference testTreeFunctions.jl:47-104)."""
    fg = generate_kaess()
    tree = build_tree(fg, order=["l2", "l1", "x1", "x2", "x3"])
    assert tree.num_cliques() == 3

    root = tree.clique_of("x3")
    assert tree.is_root(root.cid)
    assert set(root.frontals) == {"x3", "x2"}
    kids = tree.children(root.cid)
    assert len(kids) == 2
    kid_fronts = [set(k.frontals) for k in kids]
    assert {"x1", "l1"} in kid_fronts
    assert {"l2"} in kid_fronts
    for k in kids:
        assert not tree.is_root(k.cid)
        assert not k.children
        assert k.parent == root.cid
    assert repr(tree)
