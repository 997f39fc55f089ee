"""Manual variable initialization + PPE storage.

Reference parity: test/testManualInit.jl (initVariable! from points /
distribution / belief) and test/testSolveSetPPE.jl (setPPE! stores
MeanMaxPPE under the solve key).
"""

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import initfg, set_ppe, solve_tree
from incrementalinference.jl_tpu.beliefs import make_belief
from incrementalinference.jl_tpu.distributions import Normal
from incrementalinference.jl_tpu.graph import ContinuousScalar
from incrementalinference.jl_tpu.graphinit import init_variable
from incrementalinference.jl_tpu.models import LinearRelative, Prior


def _fg():
    fg = initfg()
    fg.params = fg.params.replace(N=64, graphinit=False)
    fg.add_variable("x0", ContinuousScalar)
    return fg


def test_init_from_points():
    fg = _fg()
    pts = jnp.asarray(np.random.default_rng(0).normal(7.0, 0.5, (64, 1)),
                      jnp.float32)
    init_variable(fg, "x0", pts)
    assert fg.var("x0").is_initialized()
    assert abs(float(jnp.mean(fg.points("x0"))) - 7.0) < 0.5


def test_init_from_distribution():
    fg = _fg()
    init_variable(fg, "x0", Normal(-3.0, 0.5))
    assert fg.var("x0").is_initialized()
    assert abs(float(jnp.mean(fg.points("x0"))) + 3.0) < 0.5


def test_init_from_belief_and_broadcast_point():
    fg = _fg()
    b = make_belief(fg.var("x0").manifold,
                    jnp.full((64, 1), 2.5, jnp.float32))
    init_variable(fg, "x0", b)
    assert abs(float(jnp.mean(fg.points("x0"))) - 2.5) < 1e-5
    # single point broadcasts to N copies
    fg.add_variable("x1", ContinuousScalar)
    init_variable(fg, "x1", jnp.asarray([4.0], jnp.float32))
    assert fg.points("x1").shape == (64, 1)
    assert abs(float(jnp.mean(fg.points("x1"))) - 4.0) < 1e-5


def test_named_key_manual_init():
    fg = _fg()
    init_variable(fg, "x0", Normal(1.0, 0.1), solve_key="manual")
    assert fg.var("x0").is_initialized("manual")
    assert not fg.var("x0").is_initialized("default")


def test_set_ppe_stores_estimates():
    fg = _fg()
    fg.params = fg.params.replace(graphinit=True)
    fg.add_factor(["x0"], Prior(Normal(5.0, 1.0)))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 1.0)))
    solve_tree(fg)
    est = set_ppe(fg, "x1")
    stored = fg.var("x1").ppe["default"]
    assert set(est) >= {"mean", "max", "suggested"}
    assert float(jnp.linalg.norm(stored["suggested"] - est["suggested"])) == 0
    assert abs(float(est["mean"][0]) - 15.0) < 2.5
    # solve-produced PPE agrees with a manual recompute
    est2 = set_ppe(fg, "x0")
    assert abs(float(est2["mean"][0]) - 5.0) < 2.0
