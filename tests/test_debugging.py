"""Trace/replay/viz tests (reference testStateMachine.jl + TreeDebugTools
coverage: history capture, replay, dot rendering)."""

import numpy as np

from incrementalinference.jl_tpu import solve_tree
from incrementalinference.jl_tpu.canonical import generate_caesar_ring1d
from incrementalinference.jl_tpu.config import SolverParams
from incrementalinference.jl_tpu.debugging import (print_clique_history,
                                                   print_history_sequential,
                                                   replay_clique_up,
                                                   tree_to_dot)
from incrementalinference.jl_tpu.tree.analysis import (nnz_tree, tree_cost_01,
                                                       tree_cost_02)


def _solved():
    fg = generate_caesar_ring1d(graphinit=True)
    fg.params.record_cliques = True
    tree = solve_tree(fg)
    return fg, tree


def test_traces_recorded_and_printable():
    fg, tree = _solved()
    traces = tree.traces
    assert len(traces) == tree.num_cliques()
    txt = print_clique_history(traces)
    assert "up_done" in txt
    seq = print_history_sequential(traces)
    assert "cliq" in seq


def test_replay_clique_up():
    fg, tree = _solved()
    leafless = [c for c in tree.cliques.values() if c.children]
    target = leafless[0] if leafless else list(tree.cliques.values())[0]
    msg = replay_clique_up(fg, tree, target.cid, tree.traces)
    for v, b in msg.beliefs.items():
        assert np.all(np.isfinite(np.asarray(b.points)))


def test_tree_to_dot():
    fg, tree = _solved()
    dot = tree_to_dot(tree)
    assert dot.startswith("digraph")
    assert dot.count("->") == tree.num_cliques() - len(tree.root_ids)


def test_generate_tex_tree(tmp_path):
    """LaTeX tree illustration with math-styled labels (reference
    generateTexTree, test/testTexTreeIllustration.jl)."""
    import os

    from incrementalinference.jl_tpu.debugging import generate_tex_tree
    fg, tree = _solved()
    path = generate_tex_tree(tree, path=os.path.join(tmp_path, "bt.tex"))
    tex = open(path).read()
    assert r"\begin{tikzpicture}" in tex
    assert "$" in tex                      # math-styled labels
    assert tex.count("->") == tree.num_cliques() - len(tree.root_ids)


def test_tree_costs():
    fg, tree = _solved()
    assert nnz_tree(tree) > 0
    assert tree_cost_01(tree) >= tree_cost_02(tree) >= 1.0


def test_history_dump_written(tmp_path):
    from incrementalinference.jl_tpu import solve_tree
    from incrementalinference.jl_tpu.canonical import generate_kaess
    fg = generate_kaess(graphinit=True)
    fg.params.record_cliques = True
    fg.params.logpath = str(tmp_path)
    solve_tree(fg)
    import os
    files = os.listdir(tmp_path)
    assert any(f.startswith("HistoryAll_") for f in files), files
    content = open(tmp_path / [f for f in files
                               if f.startswith("HistoryAll_")][0]).read()
    assert "up_done" in content
    # per-clique log files (reference logpath/logs/cliqN/log.txt,
    # SolverAPI.jl:139-141)
    logdirs = sorted(os.listdir(tmp_path / "logs"))
    assert logdirs and all(d.startswith("cliq") for d in logdirs), logdirs
    cliqlog = open(tmp_path / "logs" / logdirs[0] / "log.txt").read()
    assert "# solve 0" in cliqlog and "up_done" in cliqlog
    # a second solve appends to the same per-clique files
    solve_tree(fg)
    cliqlog = open(tmp_path / "logs" / logdirs[0] / "log.txt").read()
    assert "# solve 1" in cliqlog


def test_graph_to_dot_and_helix():
    from incrementalinference.jl_tpu.debugging import graph_to_dot
    from incrementalinference.jl_tpu.canonical import calc_helix_T, generate_kaess
    fg = generate_kaess(graphinit=True)
    dot = graph_to_dot(fg)
    assert dot.startswith("graph FactorGraph")
    assert dot.count("--") == sum(len(fg.factor(f).variables)
                                  for f in fg.lsf())
    T, xy, yaw = calc_helix_T(0, 2, 10)
    assert xy.shape == (len(T), 2)
    import numpy as np
    assert np.all(np.isfinite(yaw))


def test_spy_clique_matrix(tmp_path):
    from incrementalinference.jl_tpu.canonical import generate_kaess
    from incrementalinference.jl_tpu.debugging import (clique_assoc_matrix,
                                                       spy_clique_matrix)
    from incrementalinference.jl_tpu.tree.bayestree import build_tree

    fg = generate_kaess(graphinit=True)
    tree = build_tree(fg)
    cid = next(iter(tree.cliques))
    rows, cols, M = clique_assoc_matrix(fg, tree, cid)
    cl = tree.clique(cid)
    assert cols == cl.all_vars
    assert M.shape == (len(rows), len(cols))
    # every potential row covers at least one clique variable
    assert M[:len(cl.potentials)].any(axis=1).all()
    out = tmp_path / "spy.png"
    spy_clique_matrix(fg, tree, cid, path=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_animate_csm(tmp_path):
    from incrementalinference.jl_tpu import solve_tree
    from incrementalinference.jl_tpu.canonical import generate_kaess
    from incrementalinference.jl_tpu.debugging import animate_csm

    fg = generate_kaess(graphinit=True)
    fg.params.record_cliques = True
    tree = solve_tree(fg)
    out = tmp_path / "csm.gif"
    p = animate_csm(tree, tree.traces, path=str(out))
    assert p == str(out)
    assert out.exists() and out.stat().st_size > 100


def test_history_filters_and_summary():
    fg, tree = _solved()
    traces = tree.traces
    from incrementalinference.jl_tpu.debugging import (
        cliq_hist_filter_transitions, filter_hist_all_to_array,
        hist_state_machine_transitions, print_clique_summary)
    cid = next(iter(traces))
    ev = cliq_hist_filter_transitions(traces[cid], "up_done")
    assert len(ev) == 1 and ev[0][1] == "up_done"
    arr = filter_hist_all_to_array(traces, "up_done")
    assert len(arr) == tree.num_cliques()
    assert arr == sorted(arr)                       # time-ordered
    counts = hist_state_machine_transitions(traces)
    assert sum(counts.values()) > 0
    assert all(isinstance(k, tuple) and len(k) == 2 for k in counts)
    s = print_clique_summary(fg, tree, cid)
    assert f"clique {cid}" in s and "frontals" in s


def test_sandbox_step_alias():
    from incrementalinference.jl_tpu.debugging import (
        replay_clique_up, sandbox_state_machine_step)
    assert sandbox_state_machine_step is replay_clique_up
