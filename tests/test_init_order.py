"""Clique up-init variable ordering (reference testInitVariableOrder.jl:
prior-attached variables first, ascending factor count)."""

from incrementalinference.jl_tpu import initfg
from incrementalinference.jl_tpu.canonical import generate_line_step
from incrementalinference.jl_tpu.distributions import Normal
from incrementalinference.jl_tpu.graph import ContinuousScalar
from incrementalinference.jl_tpu.models import LinearRelative, Mixture, Prior
from incrementalinference.jl_tpu.parallel.scheduler import (
    cliq_var_init_order_up)


def test_init_order_line_step():
    # reference fixture: generateGraph_LineStep(3; poseEvery=1,
    # landmarkEvery=5, posePriorsAt=[0], landmarkPriorsAt=[0,2],
    # sightDistance=3)
    fg = generate_line_step(3, pose_every=1, landmark_every=5,
                            pose_priors_at=(0,), landmark_priors_at=(0, 2),
                            sight_distance=3, graphinit=False)
    order = cliq_var_init_order_up(fg)
    # the reference accepts either tie-ordering of x1/x2
    assert order in (["x0", "lm0", "x3", "x2", "x1"],
                     ["x0", "lm0", "x3", "x1", "x2"])


def test_init_order_mixture_prior():
    # reference issue #998: mixture prior must still anchor the order
    fg = initfg()
    fg.params = fg.params.replace(graphinit=False)
    fg.add_variable("x0", ContinuousScalar)
    door = Mixture(Prior,
                   [Normal(m, 3.0) for m in (-100.0, 0.0, 100.0, 300.0)],
                   diversity=[0.25] * 4)
    fg.add_factor(["x0"], door)
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(0.0, 1.0)))
    assert cliq_var_init_order_up(fg) == ["x0", "x1"]
