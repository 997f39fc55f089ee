"""Name-compat surface + remaining CSM/tree helpers (reference
ExportAPI.jl re-exports: DFG summaries, FSM debug helpers,
addDownVariableFactors!, areSiblingsRemaingNeedDownOnly, resetData!,
buildCliquePotentials, getCliqVarsWithFrontalNeighbors)."""

import numpy as np

import incrementalinference.jl_tpu as ii
from incrementalinference.jl_tpu import compat
from incrementalinference.jl_tpu.parallel.scheduler import (
    add_down_variable_factors, build_clique_subgraph)
from incrementalinference.jl_tpu.tree.accessors import (
    are_siblings_remaining_need_down_only, build_clique_potentials,
    get_cliq_vars_with_frontal_neighbors, reset_data)
from incrementalinference.jl_tpu.tree.bayestree import CliqStatus


def _chain(n=4):
    fg = ii.initfg()
    for i in range(n):
        fg.add_variable(f"x{i}", ii.ContinuousScalar)
    fg.add_factor(["x0"], ii.Prior(ii.Normal(0.0, 1.0)))
    for i in range(n - 1):
        fg.add_factor([f"x{i}", f"x{i+1}"],
                      ii.LinearRelative(ii.Normal(1.0, 0.5)))
    return fg


def test_aliases_and_summaries():
    fg = ii.initfg()
    assert isinstance(fg, ii.GraphsDFG)
    assert ii.AbstractBayesTree is ii.BayesTree
    assert ii.get_solver_params(fg).N == fg.params.N
    assert np.allclose(ii.diagm([1.0, 2.0]), np.diag([1.0, 2.0]))
    fg.add_variable("x0", ii.ContinuousScalar)
    fg.add_factor(["x0"], ii.Prior(ii.Normal(0.0, 1.0)))
    vs = ii.variable_summary(fg.var("x0"))
    assert vs.label == "x0" and vs.npoints == fg.params.N
    fs = ii.factor_summary(fg.factor(fg.lsf()[0]))
    assert fs.factor_type == "Prior" and fs.variables == ("x0",)
    assert isinstance(fg.var("x0").vartype, ii.InferenceVariable)


def test_packed_constructors_roundtrip():
    from incrementalinference.jl_tpu.serialization.packed import (
        unpack_distribution, unpack_factor_model)

    d = compat.PackedZeroMeanFullNormal(np.eye(2) * 4.0)
    z = unpack_distribution(d)
    assert np.allclose(np.asarray(z.mu), 0.0)
    assert np.allclose(np.asarray(z.cov), np.eye(2) * 4.0)
    p = compat.PackedPrior(ii.Normal(1.0, 2.0))
    m = unpack_factor_model(p)
    assert type(m).__name__ == "Prior"
    assert compat.PackedGenericMarginal()["_type"] == "GenericMarginal"
    pp = compat.PackedPartialPrior(ii.Normal(0.0, 1.0), [0])
    assert unpack_factor_model(pp).partial == (0,)


def test_packed_node_data():
    fg = _chain(3)
    tree = ii.build_tree(fg)
    cd = compat.PackedBayesTreeNodeData(tree.clique(list(tree.cliques)[0]))
    assert "frontals" in cd and "potentials" in cd
    fd = compat.PackedFunctionNodeData(fg.factor(fg.lsf()[0]))
    assert fd["fnc"]["_type"] == "Prior"


def test_frontal_neighbors_and_down_factors():
    fg = _chain(4)
    tree = ii.build_tree(fg)
    child = [c for c in tree.cliques.values() if c.parent is not None][0]
    syms = get_cliq_vars_with_frontal_neighbors(fg, child)
    # every clique var present, plus at least the frontal's graph neighbors
    assert set(child.all_vars) <= set(syms)
    sub = build_clique_subgraph(fg, child)
    before_v, before_f = set(sub.variables), set(sub.factors)
    newv, newf = add_down_variable_factors(fg, sub, child)
    assert set(newv).isdisjoint(before_v)
    assert set(newf).isdisjoint(before_f)
    assert set(syms) == set(sub.variables)
    for fl in newf:  # merged factors fully supported in the widened subgraph
        assert set(fg.factor(fl).variables) <= set(sub.variables)


def test_siblings_need_down_only():
    # star: root with two children -> siblings gate on each other's status
    fg = ii.initfg()
    for lbl in ["a", "b", "c"]:
        fg.add_variable(lbl, ii.ContinuousScalar)
    fg.add_factor(["a"], ii.Prior(ii.Normal(0.0, 1.0)))
    fg.add_factor(["a", "b"], ii.LinearRelative(ii.Normal(1.0, 0.5)))
    fg.add_factor(["a", "c"], ii.LinearRelative(ii.Normal(1.0, 0.5)))
    tree = ii.build_tree(fg)
    kids = [c for c in tree.cliques.values() if c.parent is not None]
    root = [c for c in tree.cliques.values() if c.parent is None][0]
    assert are_siblings_remaining_need_down_only(tree, root.cid)
    if len(kids) == 2:
        kids[1].status = CliqStatus.NULL
        assert not are_siblings_remaining_need_down_only(tree, kids[0].cid)
        kids[1].status = CliqStatus.UPSOLVED
        assert are_siblings_remaining_need_down_only(tree, kids[0].cid)


def test_reset_data_and_build_potentials():
    fg = _chain(3)
    tree = ii.build_tree(fg)
    assert any(f.potential_used for f in fg.factors.values())
    for f in fg.factors.values():
        reset_data(f)
    assert not any(f.potential_used for f in fg.factors.values())
    build_clique_potentials(fg, tree)
    pot = [p for c in tree.cliques.values() for p in c.potentials]
    assert sorted(pot) == sorted(fg.lsf())


def test_fsm_shims():
    from incrementalinference.jl_tpu import debugging as dbg

    fg = _chain(3)
    fg.params = fg.params.replace(record_cliques=True)
    tree = ii.solve_tree(fg)
    traces = tree.traces
    assert traces
    cid = next(iter(traces))
    assert dbg.get_state_label(traces[cid].events[0])
    line = dbg.draw_state_transition_step(traces, cid, 0)
    assert f"cliq{cid}[0]" in line
    out = dbg.draw_state_machine_history(traces)
    assert out
    assert repr(dbg.exit_state_machine) == "exitStateMachine"
    assert dbg.exit_state_machine() is None


def test_cliq_state_machine_container():
    fg = _chain(3)
    tree = ii.build_tree(fg)
    cl = tree.clique(list(tree.cliques)[0])
    sub = build_clique_subgraph(fg, cl)
    csmc = compat.CliqStateMachineContainer(dfg=fg, cliq_sub_fg=sub,
                                            tree=tree, cliq=cl)
    assert csmc.solve_key == "default" and csmc.cliq is cl


def test_get_all_trees_and_down_init_order():
    from incrementalinference.jl_tpu.tree.accessors import (
        get_cliq_init_var_order_down)
    from incrementalinference.jl_tpu.tree.analysis import get_all_trees

    fg = _chain(3)
    at = get_all_trees(fg)
    assert len(at) == 6  # 3! orderings
    assert all(len(t[0].cliques) >= 1 and t[2] > 0 for t in at.values())
    tree = ii.build_tree(fg)
    cid = list(tree.cliques)[0]
    cl = tree.clique(cid)
    order = get_cliq_init_var_order_down(fg, tree, cid, cl.separator)
    assert sorted(order) == sorted(cl.all_vars)
    # singleton-backed variables (down-msg separators) lead the order
    if cl.separator:
        assert order[0] in set(cl.separator) | set(
            v for v in cl.all_vars
            for fl in cl.potentials
            if list(fg.factor(fl).variables) == [v])


def test_packed_distribution_constructor_shims():
    """The remaining ExportAPI.jl Packed* constructors (round-4 export
    audit, SerializingDistributions.jl:4-38): each produces the packed
    dict unpack_distribution round-trips to the live distribution."""
    import numpy as np

    from incrementalinference.jl_tpu import compat
    from incrementalinference.jl_tpu.serialization.packed import (
        unpack_belief, unpack_distribution)

    z = unpack_distribution(compat.PackedNormal(3.0, 0.5))
    assert (z.mu, z.sigma) == (3.0, 0.5)
    z = unpack_distribution(compat.PackedUniform(-1.0, 2.0))
    assert (z.a, z.b) == (-1.0, 2.0)
    z = unpack_distribution(compat.PackedCategorical([0.25, 0.75]))
    assert np.allclose(np.asarray(z.p), [0.25, 0.75])
    z = unpack_distribution(compat.PackedRayleigh(2.0))
    assert z.sigma == 2.0
    z = unpack_distribution(compat.PackedDiagNormal([1.0, 2.0], [4.0, 9.0]))
    assert np.allclose(np.asarray(z.cov), np.diag([4.0, 9.0]))
    z = unpack_distribution(compat.PackedZeroMeanDiagNormal([4.0, 9.0]))
    assert np.allclose(np.asarray(z.mu), 0.0)
    z = unpack_distribution(
        compat.PackedFullNormal([1.0, 2.0], [[2.0, 0.5], [0.5, 1.0]]))
    assert np.allclose(np.asarray(z.cov), [[2.0, 0.5], [0.5, 1.0]])
    z = unpack_distribution(
        compat.PackedAliasingScalarSampler([0.0, 1.0, 2.0],
                                           [0.2, 0.3, 0.5]))
    assert np.allclose(np.asarray(z.x), [0.0, 1.0, 2.0])

    fg = ii.initfg()
    fg.add_variable("x", ii.ContinuousScalar)
    fg.add_factor(["x"], ii.Prior(ii.Normal(0.0, 1.0)))
    b = fg.get_belief("x")
    pb = compat.PackedManifoldKernelDensity(b)
    b2 = unpack_belief(pb)
    assert b2.points.shape == b.points.shape
    pbp = compat.PackedManifoldKernelDensity(b, parch=True)
    assert "points" not in pbp          # parched: hollowed-out block

    mix = ii.Mixture(ii.Prior(ii.Normal(0.0, 1.0)),
                     [ii.Normal(0.0, 1.0), ii.Normal(5.0, 1.0)],
                     [0.5, 0.5])
    from incrementalinference.jl_tpu.serialization.packed import (
        unpack_factor_model)
    m2 = unpack_factor_model(compat.PackedMixture(mix))
    assert type(m2).__name__ == "Mixture"


def test_reference_type_aliases_and_ls2():
    """LocalDFG/TreeBelief/CommonConvWrapper/abstract-hierarchy aliases
    (ExportAPI.jl re-exports) and the ls2 two-hop neighborhood
    (ParametricManopt.jl:532)."""
    from incrementalinference.jl_tpu import compat, fgos
    from incrementalinference.jl_tpu.beliefs import Belief

    assert compat.LocalDFG is ii.FactorGraph
    assert compat.TreeBelief is Belief
    assert isinstance(ii.Prior(ii.Normal(0.0, 1.0)), compat.AbstractPrior)
    assert isinstance(ii.LinearRelative(ii.Normal(0.0, 1.0)),
                      compat.AbstractRelative)
    # the reference's hierarchies are DISJOINT: a prior must NOT satisfy
    # AbstractRelative or migrated dispatch code takes the wrong branch
    assert not isinstance(ii.Prior(ii.Normal(0.0, 1.0)),
                          compat.AbstractRelative)
    assert not isinstance(ii.Prior(ii.Normal(0.0, 1.0)),
                          compat.AbstractRelativeMinimize)
    assert isinstance(ii.LinearRelative(ii.Normal(0.0, 1.0)),
                      compat.AbstractManifoldMinimize)
    # Mixture prior-ness is per-instance: follows its mechanics
    mix_rel = ii.Mixture(ii.LinearRelative,
                         [ii.Normal(0.0, 1.0), ii.Normal(2.0, 1.0)])
    mix_pri = ii.Mixture(ii.Prior,
                         [ii.Normal(0.0, 1.0), ii.Normal(2.0, 1.0)])
    assert isinstance(mix_rel, compat.AbstractRelative)
    assert not isinstance(mix_pri, compat.AbstractRelative)
    assert issubclass(ii.LinearRelative, compat.AbstractRelative)
    assert not issubclass(type(ii.Prior(ii.Normal(0.0, 1.0))),
                          compat.AbstractRelative)

    fg = ii.initfg()
    for v in ("a", "b", "c"):
        fg.add_variable(v, ii.ContinuousScalar)
    fg.add_factor(["a", "b"], ii.LinearRelative(ii.Normal(0.0, 1.0)),
                  graphinit=False)
    fg.add_factor(["b", "c"], ii.LinearRelative(ii.Normal(0.0, 1.0)),
                  graphinit=False)
    assert fgos.ls2(fg, "b") == ["a", "c"]
    assert fgos.ls2(fg, "a") == ["b"]


def test_abstract_relative_reflexive():
    """issubclass must be reflexive on the virtual base itself (a type
    table that includes the abstract marker walks through it)."""
    from incrementalinference.jl_tpu import compat
    assert issubclass(compat.AbstractRelative, compat.AbstractRelative)
    assert issubclass(compat.AbstractRelativeMinimize,
                      compat.AbstractRelative)
