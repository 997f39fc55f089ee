"""Elimination-ordering comparison (VERDICT r4 item #8): scipy-QR
column pivoting vs native constrained min-degree vs a random/worst-case
ordering, scored with tree/analysis.py's cost models on LineStep(1000)
and a hex-grid graph.

Reference roles: getEliminationOrder (BayesNet.jl:19-60, QR default /
:ccolamd via AMD) and the AnalysisTools cost models
(AnalysisTools.jl:129-163).  Pure host work — runs anywhere.

Usage: python benchmarks/ordering_compare.py
"""
import random
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def hex_grid(rows=12, cols=12):
    """2-D grid pose graph (hex-ish connectivity: right, down, diag) —
    denser treewidth than a chain, the shape where ordering quality
    shows."""
    from incrementalinference.jl_tpu import (ContinuousEuclid, initfg,
                                             LinearRelative, MvNormal, Prior)
    from incrementalinference.jl_tpu.config import SolverParams

    fg = initfg(SolverParams(N=8, graphinit=False))
    name = lambda r, c: f"x{r}_{c}"                      # noqa: E731
    for r in range(rows):
        for c in range(cols):
            fg.add_variable(name(r, c), ContinuousEuclid(2))
    fg.add_factor([name(0, 0)], Prior(MvNormal([0.0, 0.0], [0.1, 0.1])),
                  graphinit=False)
    for r in range(rows):
        for c in range(cols):
            for dr, dc in ((0, 1), (1, 0), (1, 1)):
                r2, c2 = r + dr, c + dc
                if r2 < rows and c2 < cols:
                    fg.add_factor(
                        [name(r, c), name(r2, c2)],
                        LinearRelative(MvNormal([float(dc), float(dr)],
                                                [0.1, 0.1])),
                        graphinit=False)
    return fg


def linestep1000():
    from incrementalinference.jl_tpu.canonical import generate_line_step
    return generate_line_step(1000, graphinit=False)


def score(fg, order, label, build_wall):
    from incrementalinference.jl_tpu.tree.analysis import (nnz_tree,
                                                           tree_cost_02)
    from incrementalinference.jl_tpu.tree.bayestree import build_tree

    t0 = time.time()
    tree = build_tree(fg, order=order)
    tb = time.time() - t0
    max_cl = max(len(c.all_vars) for c in tree.cliques.values())
    print(f"#   {label:28s} order {build_wall*1e3:8.1f} ms, tree build "
          f"{tb*1e3:7.1f} ms, {tree.num_cliques():4d} cliques, "
          f"max clique {max_cl:3d}, nnz {nnz_tree(tree):7d}, "
          f"cost02 {float(tree_cost_02(tree)):.3g}", flush=True)


def run(name, fg_builder):
    from incrementalinference.jl_tpu.tree.ordering import (
        get_elimination_order)

    fg = fg_builder()
    print(f"# {name}: {len(fg.ls())} vars, {len(fg.lsf())} factors",
          flush=True)
    for method in ("qr", "ccolamd"):
        fg = fg_builder()
        t0 = time.time()
        order = get_elimination_order(fg, method=method)
        w = time.time() - t0
        score(fg, order, method, w)
    # random ordering as the upper-bound control
    fg = fg_builder()
    order = [v for v in fg.ls() if fg.var(v).solvable > 0]
    rng = random.Random(7)
    rng.shuffle(order)
    score(fg, order, "random (control)", 0.0)


if __name__ == "__main__":
    run("LineStep(1000)", linestep1000)
    run("hex-grid 12x12", hex_grid)
