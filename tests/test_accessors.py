"""Accessor-surface parity tests: graph get/set/list/find utilities
(fgos.py — reference DFG accessors + FGOSUtils.jl), clique/tree accessors
(tree/accessors.py — JunctionTreeUtils.jl / TreeMessageAccessors.jl), and
the blob datastore (datastore.py — DFG FolderStore/addData! API)."""

import json
import os

import numpy as np
import pytest

import incrementalinference.jl_tpu as ii
from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Normal, Prior, initfg, solve_tree)


def _chain(n=3, graphinit=True):
    fg = initfg(ii.SolverParams(N=50, graphinit=graphinit))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)))
    for i in range(1, n):
        fg.add_variable(f"x{i}", ContinuousScalar)
        fg.add_factor([f"x{i-1}", f"x{i}"],
                      LinearRelative(Normal(10.0, 0.5)))
    return fg


# ---------------------------------------------------------------------------
# fgos — basic accessors
# ---------------------------------------------------------------------------

def test_get_list_variables_factors():
    fg = _chain()
    assert ii.get_variable(fg, "x1") is fg.var("x1")
    fl = fg.lsf()[0]
    assert ii.get_factor(fg, fl) is fg.factor(fl)
    assert ii.list_variables(fg) == ["x0", "x1", "x2"]
    assert ii.list_variables(fg, regex=r"x[12]") == ["x1", "x2"]
    assert len(ii.list_factors(fg)) == 3
    assert ii.is_variable(fg, "x0") and not ii.is_variable(fg, fl)
    assert ii.is_factor(fg, fl) and not ii.is_factor(fg, "x0")
    assert ii.get_label(fg.var("x0")) == "x0"
    assert ii.get_variable_type(fg, "x0") == ContinuousScalar
    assert ii.get_variable_dim(fg, "x0") == 1
    assert ii.get_dimension(fg.var("x0")) == 1
    assert isinstance(ii.get_factor_type(fg, fl), Prior)
    assert ii.get_factor_dim(fg, fl) == 1
    assert ii.get_timestamp(fg, "x0") > 0


def test_solvable_and_tags():
    fg = _chain()
    assert ii.get_solvable(fg, "x0") == 1
    ii.set_solvable(fg, "x0", 0)
    assert ii.get_solvable(fg, "x0") == 0
    assert ii.list_variables(fg, solvable=1) == ["x1", "x2"]
    fg.var("x1").tags.add("POSE")
    assert "POSE" in ii.get_tags(fg, "x1")


def test_val_bw_numpts():
    fg = _chain()
    pts = ii.get_val(fg, "x1")
    assert pts.shape == (50, 1)
    assert ii.get_num_pts(fg, "x1") == 50
    ii.set_val(fg, "x1", np.full((50, 1), 7.0))
    assert abs(float(np.asarray(ii.get_val(fg, "x1")).mean()) - 7.0) < 1e-6
    bw = ii.get_bw(fg, "x1")
    ii.set_bw(fg, "x1", np.asarray(bw) * 2.0)
    assert np.allclose(np.asarray(ii.get_bw(fg, "x1")),
                       np.asarray(bw) * 2.0)


def test_ppe_accessors_and_find_near():
    fg = _chain()
    solve_tree(fg)
    for l in fg.ls():
        assert "suggested" in ii.get_variable_ppe(fg, l)
    m = float(np.asarray(ii.get_ppe_mean(fg, "x2")))
    assert abs(m - 20.0) < 2.0
    assert "default" in ii.get_ppe_dict(fg, "x2")
    labels, mat = ii.get_ppe_suggested_all(fg)
    assert labels == ["x0", "x1", "x2"] and mat.shape == (3, 1)
    near, dists = ii.find_variables_near(fg, [9.5], number=1)
    assert near == ["x1"] and dists[0] < 2.0
    # calc (non-storing) matches the belief
    est = ii.calc_variable_ppe(fg, "x1")
    assert abs(float(np.asarray(est["mean"])) -
               float(np.asarray(ii.get_ppe_mean(fg, "x1")))) < 1e-4


def test_solver_data_mutation_and_solvekeys():
    fg = _chain()
    solve_tree(fg)
    ii.set_solved_count(fg, "x0", 5)
    assert fg.var("x0").get_solved_count() == 5
    ii.set_marginalized(fg, "x0", True)
    assert ii.is_marginalized(fg, "x0")
    assert ii.unfreeze_variables_all(fg) == ["x0"]
    assert not ii.is_marginalized(fg, "x0")

    keys = ii.list_solve_keys(fg)
    assert "default" in keys
    copied = ii.clone_solve_key(fg, "backup", "default")
    assert set(copied) == {"x0", "x1", "x2"}
    assert "backup" in ii.list_supersolves(fg, "x1")
    ii.delete_variable_solver_data(fg, "x1", "backup")
    assert "backup" not in ii.list_solve_keys(fg, "x1")

    ii.set_variable_initialized(fg, "x0", False)
    assert not fg.var("x0").is_initialized()
    ii.set_variable_infer_dim(fg, "x0", 0.25)
    assert np.allclose(np.asarray(fg.get_belief("x0").ipc), 0.25)
    ii.reset_variable(fg, "x0")
    assert "default" not in fg.var("x0").beliefs
    ii.set_variable_reference(fg, "x0", np.zeros((50, 1)))
    assert "reference" in ii.list_solve_keys(fg, "x0")


def test_copy_graph_and_sort():
    fg = _chain()
    full = ii.deepcopy_graph(fg)
    assert full.ls() == fg.ls() and full.lsf() == fg.lsf()
    # mutating the copy leaves the original intact
    full.remove_variable("x2")
    assert "x2" in fg.ls()
    sub = ii.copy_graph(fg, ["x0", "x1"])
    assert sub.ls() == ["x0", "x1"] and len(sub.lsf()) == 2

    labels = ["x10", "x2", "x1"]
    assert ii.sort_dfg(labels) == ["x1", "x2", "x10"]
    assert ii.get_variable_order(fg) == ["x0", "x1", "x2"]


def test_find_factors_between_and_among():
    fg = _chain(4)
    between = ii.find_factors_between_from(fg, ["x0", "x1"], "x0")
    models = [type(fg.factor(f).model).__name__ for f in between]
    assert sorted(models) == ["LinearRelative", "Prior"]
    among = ii.get_factors_among_variables_only(fg, ["x1", "x2"],
                                                unused=False)
    assert len(among) == 1
    # symbolic elimination consumes potentials → unused=True excludes them
    from incrementalinference.jl_tpu.tree import build_tree
    build_tree(fg)
    assert ii.get_factors_among_variables_only(fg, ["x1", "x2"]) == []


def test_find_closest_timestamp():
    fg = _chain()
    ts = ii.get_timestamp(fg, "x1")
    assert ii.find_closest_timestamp(fg, ts, labels=fg.ls()) == "x1"


def test_measurements_and_deconv_solve_key():
    fg = _chain()
    solve_tree(fg)
    fl = [f for f in fg.lsf() if len(fg.factor(f).variables) == 2][0]
    z = np.asarray(ii.get_measurements(fg, fl, n=30))
    assert z.shape[0] == 30 and abs(z.mean() - 10.0) < 1.0
    ii.clone_solve_key(fg, "shifted", "default")
    solved, _ = ii.deconv_solve_key(fg, "x0", "default", "x1", "default")
    # implied relative transform between x0 and x1 estimates ≈ +10
    assert abs(float(np.asarray(solved).mean()) - 10.0) < 2.5


def test_numeric_helpers():
    assert abs(ii.fastnorm([3.0, 4.0]) - 5.0) < 1e-12
    m = ii.reshape_vec2mat([1, 2, 3, 4, 5, 6], 2)
    assert m.shape == (2, 3) and m[0, 0] == 1 and m[1, 0] == 2  # col-major
    # double integrator: Phi should be [[1 dt],[0 1]], Gamma [[dt²/2],[dt]]
    F = [[0.0, 1.0], [0.0, 0.0]]
    G = [[0.0], [1.0]]
    Qc = [[1.0]]
    dt = 0.5
    Phi, Gamma, Qd = ii.fgos.cont2disc(F, G, Qc, dt)
    assert np.allclose(Phi, [[1.0, dt], [0.0, 1.0]])
    assert np.allclose(Gamma, [[dt * dt / 2], [dt]], atol=1e-12)
    # Van Loan Qd for double integrator: [[dt³/3, dt²/2],[dt²/2, dt]]
    assert np.allclose(Qd, [[dt**3 / 3, dt**2 / 2], [dt**2 / 2, dt]],
                       atol=1e-10)


def test_printers(capsys):
    fg = _chain()
    solve_tree(fg)
    s = ii.fgos.print_variable(fg, "x0", short=False)
    assert "x0" in s and "solveKey" in s
    s = ii.fgos.print_factor(fg, fg.lsf()[0])
    assert "Prior" in s
    s = ii.fgos.print_graph_summary(fg)
    assert "3 variables" in s


# ---------------------------------------------------------------------------
# tree accessors
# ---------------------------------------------------------------------------

def _solved_tree():
    fg = _chain(4)
    tree = solve_tree(fg)
    return fg, tree


def test_clique_lookup_and_topology():
    fg, tree = _solved_tree()
    root = tree.clique(tree.root_ids[0])
    assert ii.get_clique(fg_tree := tree, root.frontals[0]) is root
    assert ii.get_num_cliqs(tree) == tree.num_cliques()
    assert set(ii.get_clique_ids(tree)) == set(tree.cliques)
    assert ii.has_clique(tree, root.frontals[0])
    assert ii.get_parent(tree, root) is None
    assert ii.parent_cliq(tree, root) == []
    kids = ii.get_children(tree, root)
    assert kids == ii.child_cliqs(tree, root)
    if kids:
        assert ii.get_cliq_depth(tree, kids[0]) == 1
        assert ii.get_parent(tree, kids[0]) is root
        sibs = ii.get_cliq_siblings(tree, kids[0], inclusive=True)
        assert kids[0] in sibs
    assert ii.get_frontals(root) == root.frontals


def test_clique_contents_and_matrices():
    fg, tree = _solved_tree()
    root = tree.clique(tree.root_ids[0])
    assert ii.get_cliq_frontal_var_ids(root) == root.frontals
    assert ii.get_cliq_separator_var_ids(root) == root.separator
    assert ii.get_cliq_all_var_ids(root) == root.frontals + root.separator
    assert ii.get_cliq_factor_ids_all(root) == root.potentials
    assert all(f.label in root.potentials
               for f in ii.get_cliq_factors(fg, root))
    pri = ii.get_cliq_var_ids_priors(fg, root)
    assert pri == ii.get_cliq_var_singletons(fg, root)
    A = ii.get_cliq_assoc_mat(fg, tree, root.cid)
    M = ii.get_cliq_msg_mat(fg, tree, root.cid)
    full = ii.get_cliq_mat(fg, tree, root.cid)
    assert A.shape[0] + M.shape[0] == full.shape[0]
    assert A.shape[1] == len(root.all_vars)
    counts = ii.get_cliq_num_assoc_factors_per_var(fg, tree, root.cid)
    assert counts.shape == (len(root.all_vars),)


def test_clique_status_predicates_and_color():
    fg, tree = _solved_tree()
    from incrementalinference.jl_tpu.tree import CliqStatus
    root = tree.clique(tree.root_ids[0])
    assert ii.get_clique_status(root) == CliqStatus.DOWNSOLVED
    assert ii.is_cliq_initialized(root) and ii.is_cliq_up_solved(root)
    assert ii.is_tree_solved(tree)
    assert ii.is_up_inference_complete(tree)
    assert ii.are_cliq_variables_all_initialized(fg, root)
    assert not ii.are_cliq_variables_all_marginalized(fg, root)
    assert ii.get_clique_draw_color(root) == "lightgreen"
    ii.set_clique_draw_color(root, "pink")
    assert ii.get_clique_draw_color(root) == "pink"
    ii.set_clique_status(root, CliqStatus.NULL)
    assert not ii.is_tree_solved(tree)


def test_tree_edits_resets_recycle_stats():
    fg, tree = _solved_tree()
    from incrementalinference.jl_tpu.tree import CliqStatus
    root = tree.clique(tree.root_ids[0])
    extra = [v for v in fg.ls() if v not in root.all_vars]
    if extra:
        ii.append_separator_to_clique(tree, root.cid, [extra[0]])
        assert extra[0] in root.separator
    syms = ii.get_tree_all_frontal_syms(tree)
    assert sorted(syms) == sorted(fg.ls())
    order = ii.get_cliq_var_solve_order_up(fg, root)
    assert set(order) <= set(root.all_vars)
    total, marg, reused, both = ii.calc_cliques_recycled(tree)
    assert total == tree.num_cliques()
    ii.reset_cliq_solve(fg, tree, root.cid)
    assert root.status == CliqStatus.NULL
    ii.reset_tree_cliques_for_up_solve(tree)
    assert all(c.status == CliqStatus.NULL for c in tree.cliques.values())


def test_up_msg_introspection_and_tree_product():
    fg, tree = _solved_tree()
    msgs = ii.get_tree_cliq_up_msgs_all(tree)
    assert set(msgs) == set(tree.cliques)
    stacked = ii.stack_cliq_up_msgs_by_variable(tree)
    for lbl, entries in stacked.items():
        assert all("belief" in e and "cliqId" in e for e in entries)
    # manual clique product at the root frontal ≈ the solved belief
    root = tree.clique(tree.root_ids[0])
    var = root.frontals[0]
    b = ii.tree_product_up(fg, tree, var, var)
    got = float(np.asarray(b.points).mean())
    want = float(np.asarray(fg.points(var)).mean())
    assert abs(got - want) < 3.0
    b2 = ii.tree_product_down(fg, tree, var, var)
    assert np.asarray(b2.points).shape == np.asarray(b.points).shape


# ---------------------------------------------------------------------------
# datastore
# ---------------------------------------------------------------------------

def test_datastore_roundtrip(tmp_path):
    fg = _chain(2, graphinit=False)
    store = ii.FolderStore(str(tmp_path / "blobs"), key="data")
    ii.add_blob_store(fg, store)
    payload = json.dumps({"camera": "left", "seq": 7}).encode()
    entry = ii.add_data(fg, "x0", "img_meta", payload,
                        mime_type="application/json/octet-stream")
    assert ii.list_blob_entries(fg, "x0") == ["img_meta"]
    got_entry, raw = ii.get_data(fg, "x0", "img_meta")
    assert raw == payload and got_entry.blob_id == entry.blob_id
    doc = ii.fetch_data_json(fg, "x0", "img_meta")
    assert doc["camera"] == "left" and doc["seq"] == 7
    # blob persisted on disk
    assert os.path.exists(str(tmp_path / "blobs" / entry.blob_id))
    ii.delete_data(fg, "x0", "img_meta")
    assert ii.list_blob_entries(fg, "x0") == []
    assert not os.path.exists(str(tmp_path / "blobs" / entry.blob_id))


def test_datastore_memory_and_hash_check():
    fg = _chain(2, graphinit=False)
    ii.add_blob_store(fg, ii.InMemoryBlobStore())
    e = ii.add_data(fg, "x1", "scan", b"\x01\x02\x03")
    _, raw = ii.get_data(fg, "x1", "scan")
    assert raw == b"\x01\x02\x03"
    # tamper → hash mismatch raises
    ii.get_blob_store(fg).put(e.blob_id, b"tampered")
    with pytest.raises(ValueError):
        ii.get_data(fg, "x1", "scan")


# ---------------------------------------------------------------------------
# object listings / lifecycle / string parsing (second accessor batch)
# ---------------------------------------------------------------------------

def test_object_listings_and_solver_data():
    fg = _chain()
    solve_tree(fg)
    vs = ii.get_variables(fg)
    assert [v.label for v in vs] == fg.ls()
    fs = ii.get_factors(fg)
    assert [f.label for f in fs] == fg.lsf()
    sd = ii.get_solver_data(fg, "x1")
    assert sd["initialized"] and sd["solved_count"] > 0
    assert sd["belief"] is fg.get_belief("x1")
    bw = ii.get_bw_val(fg, "x1")
    assert bw.shape[-1] == 1 and np.all(bw > 0)


def test_point_identity_type_and_multihypo_dist():
    from incrementalinference.jl_tpu import Position2
    p = ii.get_point_identity(Position2)
    assert np.allclose(np.asarray(p), 0.0) and p.shape == (2,)
    shape, dtype = ii.get_point_type(Position2)
    assert shape == (2,)
    fg = _chain()
    fg.add_variable("l1", ContinuousScalar)
    f = fg.add_factor(["x0", "x1", "l1"], LinearRelative(Normal(0, 1)),
                      multihypo=[1.0, 0.5, 0.5])
    d = ii.get_multihypo_distribution(fg, f.label)
    assert np.allclose(np.asarray(d.p), [0.5, 0.25, 0.25])
    assert ii.get_multihypo_distribution(fg, fg.lsf()[0]) is None


def test_logpath_type_listings_and_tree():
    fg = _chain()
    assert ii.get_log_path(fg) == fg.params.logpath
    assert ii.join_log_path(fg, "logs", 3).endswith("logs/3")
    lt = ii.ls_types(fg)
    assert lt == {"ContinuousEuclid1": ["x0", "x1", "x2"]}
    ft = ii.lsf_types(fg)
    assert set(ft) == {"Prior", "LinearRelative"}
    txt = ii.list_type_tree()
    assert "FactorModel" in txt and "Prior" in txt
    # workspace introspection (reference getCurrentWorkspaceFactors /
    # getCurrentWorkspaceVariables, ext/IncrInfrInteractiveUtilsExt.jl)
    wf = [c.__name__ for c in ii.get_current_workspace_factors()]
    assert {"Prior", "LinearRelative", "Mixture"} <= set(wf)
    wv = [v.name for v in ii.get_current_workspace_variables()]
    assert "ContinuousEuclid1" in wv and "Circular" in wv


def test_solver_data_lifecycle():
    fg = _chain()
    made = ii.make_solver_data(fg, "parametric_init")
    assert made == fg.ls()
    assert "parametric_init" in ii.list_solve_keys(fg, "x0")
    from incrementalinference.jl_tpu.tree import build_tree
    build_tree(fg)
    assert any(f.potential_used for f in fg.factors.values())
    ii.reset_factor_graph_new_tree(fg)
    assert not any(f.potential_used for f in fg.factors.values())
    ii.default_fixed_lag_on_tree(fg, qfl=2)
    assert fg.params.qfl == 2 and fg.params.is_fixed_lag
    ii.init_variable_manual(fg, "x0", np.full((50, 1), 3.0))
    assert abs(float(np.asarray(fg.points("x0")).mean()) - 3.0) < 1e-5


def test_distribution_string_parsing():
    n = ii.normal_from_string("Normal(2.0, 0.5)")
    assert n.mu == 2.0 and n.sigma == 0.5
    c = ii.categorical_from_string("Categorical([0.2, 0.8])")
    assert np.allclose(np.asarray(c.p), [0.2, 0.8])
    u = ii.extract_distribution("Uniform(0.0, 2.0)")
    assert u.a == 0.0 and u.b == 2.0
    mv = ii.extract_distribution("MvNormal([0.0, 1.0], [1.0, 1.0])")
    assert np.asarray(mv.mu).shape == (2,)
    with pytest.raises(ValueError):
        ii.extract_distribution("Bogus(1)")


def test_position_aliases():
    from incrementalinference.jl_tpu import (Position1, Position2,
                                             Position3, Position4)
    for n, vt in enumerate((Position1, Position2, Position3, Position4), 1):
        assert vt.manifold.dof == n


def test_preamble_cache_hook():
    from incrementalinference.jl_tpu.models import PriorModel

    calls = []

    class CachedPrior(Prior):
        def preamble_cache(self, fg, variables, factor):
            calls.append((factor.label, [v.label for v in variables]))
            return {"range_lookup": 42}

    fg = initfg(ii.SolverParams(N=30))
    fg.add_variable("a", ContinuousScalar)
    f = fg.add_factor(["a"], CachedPrior(Normal(0, 1)), graphinit=False)
    assert f.cache == {"range_lookup": 42}
    assert calls == [(f.label, ["a"])]


def test_down_msgs_and_subfg_history():
    fg = _chain(4)
    fg.params = fg.params.replace(record_cliques=True)
    tree = solve_tree(fg)
    root = tree.clique(tree.root_ids[0])
    sent = ii.get_cliq_down_msgs_after_down_solve(tree, root.cid)
    assert set(sent) == set(root.children)
    from incrementalinference.jl_tpu.debugging import (
        get_cliq_subgraph_from_history, print_history_lanes)
    # leaf cliques run a real up-solve and capture their subgraph
    leaf = [c for c in tree.cliques.values() if not c.children][0]
    sub = get_cliq_subgraph_from_history(tree.traces, leaf.cid)
    assert set(sub.ls()) == set(leaf.all_vars)
    lanes = print_history_lanes(tree.traces)
    assert f"cliq{leaf.cid}" in lanes and "up_done" in lanes


def test_lsf_priors_and_compare_special():
    fg = _chain(3, graphinit=False)
    pri = ii.lsf_priors(fg)
    assert len(pri) == 1 and fg.factor(pri[0]).is_prior
    # all other factors are relatives
    assert all(not fg.factor(l).is_prior
               for l in fg.lsf() if l not in pri)
    f = fg.factor(fg.lsf()[0])
    g = fg.factor(fg.lsf()[1])
    assert ii.compare_all_special(f, f)
    assert not ii.compare_all_special(f, g, show=False)
    assert ii.compare_factors(f, f) and not ii.compare_factors(f, g)
