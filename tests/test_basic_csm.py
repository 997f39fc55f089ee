"""Basic clique-scheduler end-to-end sanity (reference test/testBasicCSM.jl
— IIF #485): a three-variable chain with one prior, solved through the full
scheduler with a bounded iteration budget, lands the far variable at the
chained offset."""

import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Normal, Prior, initfg, solve_tree)
from incrementalinference.jl_tpu.config import SolverParams


def test_basic_three_variable_graph_with_prior():
    """reference testBasicCSM.jl:13-69 — a=0 prior, a-b and b-c relatives
    of 50 each: mean(c) must land in (70, 130)."""
    fg = initfg(SolverParams(limit_iters=50))     # :51 limititers=50
    fg.add_variable("a", ContinuousScalar, tags=("POSE",))
    fg.add_variable("b", ContinuousScalar, tags=("POSE",))
    fg.add_variable("c", ContinuousScalar, tags=("LANDMARK",))
    fg.add_factor(["a", "b"], LinearRelative(Normal(50.0, 2.0)))
    fg.add_factor(["b", "c"], LinearRelative(Normal(50.0, 2.0)))
    fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))

    from incrementalinference.jl_tpu.graphinit import init_all

    init_all(fg)
    tree = solve_tree(fg)
    assert tree.num_cliques() >= 1

    pts = np.asarray(fg.points("c"))[:, 0]
    assert 70.0 < pts.mean() < 130.0, pts.mean()
    # the chain's middle variable sits halfway
    ptsb = np.asarray(fg.points("b"))[:, 0]
    assert 20.0 < ptsb.mean() < 80.0, ptsb.mean()
