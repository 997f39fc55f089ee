"""Incremental SE(2) SLAM: odometry arcs, a landmark, loop closure,
clique recycling, persistence, and a parametric cross-check.

Note: the first run on a fresh machine pays one-time XLA compiles for the
SE(2) kernel structures (minutes on TPU); subsequent runs hit the
persistent compilation cache and complete in seconds.
"""

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (ContinuousEuclid, ManifoldFactor,
                                         ManifoldPrior, MvNormal,
                                         VariableType, initfg, load_graph,
                                         save_graph, solve_tree)
from incrementalinference.jl_tpu.canonical import _Pose2Point2Bearingless
from incrementalinference.jl_tpu.manifolds import SE2
from incrementalinference.jl_tpu.parametric import solve_graph_parametric


def main():
    se2 = SE2()
    pose2 = VariableType("Pose2", se2)
    fg = initfg()
    fg.add_variable("x0", pose2)
    fg.add_factor(["x0"], ManifoldPrior(
        se2, jnp.zeros(3), MvNormal([0.0] * 3, [0.05, 0.05, 0.02])))

    odo = MvNormal([2.0, 0.0, 0.6], [0.05, 0.05, 0.02])
    tree = None
    for i in range(1, 5):
        fg.add_variable(f"x{i}", pose2)
        fg.add_factor([f"x{i-1}", f"x{i}"], ManifoldFactor(se2, odo))
        if i == 2:
            fg.add_variable("l1", ContinuousEuclid(2))
            fg.add_factor(["x2", "l1"], _Pose2Point2Bearingless(
                MvNormal([3.0, 0.0], [0.1, 0.1])))
        tree = solve_tree(fg, old_tree=tree)       # incremental
    recycled = sum(c.is_recycled for c in tree.cliques.values())
    print(f"recycled cliques in final incremental solve: "
          f"{recycled}/{tree.num_cliques()}")

    path = save_graph(fg, "/tmp/iitpu/se2_slam.json")
    fg2 = load_graph(path)
    solve_graph_parametric(fg2)
    for v in ("x4", "l1"):
        print(v, "parametric:",
              np.round(np.asarray(fg2.var(v).parametric_point), 2))


if __name__ == "__main__":
    main()
