"""Multi-hypothesis API: user-defined factor types through the multihypo
machinery, convolution mass bars, and pack/unpack of custom factors
(reference test/testmultihypothesisapi.jl — the tri-modal convolution bars
:171-263 and the packing round-trip :135-155)."""

import jax.numpy as jnp
import numpy as np
import pytest

from incrementalinference.jl_tpu import (ContinuousScalar, Normal,
                                         PriorModel, FactorModel,
                                         approx_conv_belief, initfg,
                                         register_factor_model)
from incrementalinference.jl_tpu.config import SolverParams
from incrementalinference.jl_tpu.graphinit import init_all, init_variable
from incrementalinference.jl_tpu.ops.hypo import parse_multihypo
from incrementalinference.jl_tpu.serialization.packed import (
    pack_factor_model, unpack_factor_model)


class DevelopPrior(PriorModel):
    """User prior keeping its belief in a custom ``.x`` field rather than
    the default ``.Z`` (reference DevelopPrior,
    testmultihypothesisapi.jl:15-20)."""

    def __init__(self, x):
        self.x = x

    @property
    def zdim(self):
        return 1

    def sample(self, key, n):
        return self.x.sample(key, n)

    def sample_points(self, key, n, manifold):
        return self.x.sample(key, n)

    def residual(self, meas, p):
        return meas - p

    def mean_cov(self):
        return self.x.mean_cov()


class DevelopLikelihood(FactorModel):
    """User relative with a ``.x`` field (reference DevelopLikelihood,
    testmultihypothesisapi.jl:22-28): residual meas - (xj - xi)."""

    def __init__(self, x):
        self.x = x

    @property
    def zdim(self):
        return 1

    def sample(self, key, n):
        return self.x.sample(key, n)

    def residual(self, meas, xi, xj):
        return meas - (xj - xi)

    def mean_cov(self):
        return self.x.mean_cov()


register_factor_model(DevelopPrior, children=("x",))
register_factor_model(DevelopLikelihood, children=("x",))

N = 100


def _build_bimodal():
    """The :38-84 build: prior at 10 on x1, relative 100 to x2, then a
    2-of multihypo relative [x2; x3; x4] with weights [1, .5, .5]."""
    fg = initfg(SolverParams(N=N))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x1"], DevelopPrior(Normal(10.0, 1.0)))
    init_all(fg)
    fg.add_variable("x2", ContinuousScalar)
    fg.add_factor(["x1", "x2"], DevelopLikelihood(Normal(100.0, 1.0)))
    init_all(fg)
    fg.add_variable("x3", ContinuousScalar)
    fg.add_variable("x4", ContinuousScalar)
    f3 = fg.add_factor(["x2", "x3", "x4"],
                       DevelopLikelihood(Normal(90.0, 1.0)),
                       multihypo=[1.0, 0.5, 0.5])
    return fg, f3


def test_populate_multihypo_graph():
    """reference :38-84 — prior lands at 10, relative chain at 110, and
    the parsed hypothesis weights are certain=1.0 → 0, uncertain 0.5/0.5."""
    fg, f3 = _build_bimodal()
    pts = np.asarray(approx_conv_belief(fg, "x1f1", "x1").points)[:, 0]
    assert np.sum(np.abs(pts - 1.0) < 5) < 0.30 * N
    assert np.sum(np.abs(pts - 10.0) < 5) > 0.30 * N

    x2 = np.asarray(fg.points("x2"))[:, 0]
    assert abs(x2.mean() - 110.0) < 10.0

    certain, uncertain, weights = parse_multihypo(f3.multihypo)
    assert certain == (0,)                 # 1.0 becomes certain slot
    assert uncertain == (1, 2)
    assert np.allclose(weights, [0.5, 0.5], atol=0.1)


def test_multihypo_convolution_mass():
    """reference :87-105 — solving the certain variable pushes ~all mass
    through (x3/x4 at 2/3 minus the 90 measurement → ≤ -70); solving an
    uncertain variable splits the mass."""
    fg, f3 = _build_bimodal()
    init_variable(fg, "x2", jnp.ones((N, 1)))
    init_variable(fg, "x3", 2 * jnp.ones((N, 1)))
    init_variable(fg, "x4", 3 * jnp.ones((N, 1)))

    pts = np.asarray(approx_conv_belief(fg, f3.label, "x2").points)[:, 0]
    assert np.sum(pts <= -70.0) > 0.95 * N

    for target in ("x3", "x4"):
        pts = np.asarray(approx_conv_belief(fg, f3.label, target).points)[:, 0]
        frac = np.sum((70.0 < pts) & (pts < 110.0))
        assert 0.1 * N < frac < 0.75 * N, (target, frac)


def test_trimodal_factor():
    """reference :171-263 — the 4-ary [1, .333, .333, .334] factor: parsed
    weights, near-total mass through the certain slot, and the uncertain
    targets' 0.1N–0.5N windows."""
    n = 200
    fg = initfg(SolverParams(N=n))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x1"], DevelopPrior(Normal(10.0, 1.0)))
    init_all(fg)
    assert fg.points("x1").shape[0] == n

    pts = np.asarray(approx_conv_belief(fg, "x1f1", "x1").points)[:, 0]
    assert np.sum(np.abs(pts - 1.0) < 5) < 0.15 * n
    assert np.sum(np.abs(pts - 10.0) < 5) > 0.15 * n

    fg.add_variable("x2", ContinuousScalar)
    fg.add_factor(["x1", "x2"], DevelopLikelihood(Normal(100.0, 1.0)))
    init_all(fg)
    assert abs(np.asarray(fg.points("x2"))[:, 0].mean() - 110.0) < 10.0

    for v in ("x3", "x4", "x5"):
        fg.add_variable(v, ContinuousScalar)
    f3 = fg.add_factor(["x2", "x3", "x4", "x5"],
                       DevelopLikelihood(Normal(90.0, 1.0)),
                       multihypo=[1.0, 0.333, 0.333, 0.334])
    certain, uncertain, weights = parse_multihypo(f3.multihypo)
    assert certain == (0,) and uncertain == (1, 2, 3)
    assert abs(weights[0] - 0.333) < 1e-3
    assert abs(weights[1] - 0.333) < 1e-3
    assert abs(weights[2] - 0.334) < 1e-3

    init_variable(fg, "x2", 1 * jnp.ones((n, 1)))
    init_variable(fg, "x3", 2 * jnp.ones((n, 1)))
    init_variable(fg, "x4", 3 * jnp.ones((n, 1)))
    init_variable(fg, "x5", 4 * jnp.ones((n, 1)))

    # solve for the certain variable: ≥95% of mass ≤ -70
    pts = np.asarray(approx_conv_belief(fg, f3.label, "x2").points)[:, 0]
    assert np.sum(pts <= -70.0) > 0.95 * n

    # each uncertain variable: a ~1/3 slice lands at ~91, rest stays put
    for target in ("x3", "x4", "x5"):
        pts = np.asarray(approx_conv_belief(fg, f3.label, target).points)[:, 0]
        frac = np.sum((80.0 < pts) & (pts < 100.0))
        assert 0.1 * n < frac < 0.5 * n, (target, frac)


def test_pack_unpack_custom_factor():
    """reference :135-155 — the user's custom prior and multihypo
    likelihood round-trip the packing converters with parameters and the
    hypothesis weights intact."""
    fg, f3 = _build_bimodal()

    packed = pack_factor_model(fg.factor("x1f1").model)
    model = unpack_factor_model(packed)
    assert isinstance(model, DevelopPrior)
    mu, cov = model.mean_cov()
    assert abs(float(np.asarray(mu).reshape(())) - 10.0) < 1e-9
    assert abs(float(np.asarray(cov).reshape(())) - 1.0) < 1e-9

    packed = pack_factor_model(f3.model)
    model = unpack_factor_model(packed)
    assert isinstance(model, DevelopLikelihood)

    # a full graph round-trip keeps the hyporecipe weights
    import os
    import tempfile

    from incrementalinference.jl_tpu.serialization import (load_graph,
                                                           save_graph)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "mh.json")
        save_graph(fg, p)
        fg2 = load_graph(p)
    f3b = fg2.factor(f3.label)
    certain, uncertain, weights = parse_multihypo(f3b.multihypo)
    assert certain == (0,) and uncertain == (1, 2)
    assert np.allclose(weights, [0.5, 0.5], atol=0.1)


def test_multihypo_numerical_tolerance_1086():
    """reference :267-280 (#1086) — float weight vectors that sum to 1
    only within numerical tolerance must be accepted."""
    fg = initfg()
    for v in ("x0", "x1a", "x1b"):
        fg.add_variable(v, ContinuousScalar)
    from incrementalinference.jl_tpu import LinearRelative

    fg.add_factor(["x0", "x1a", "x1b"], LinearRelative(Normal(0.0, 1.0)),
                  multihypo=[1.0, 0.5, 0.4999999999999], graphinit=False)
    fg.add_factor(["x0", "x1a", "x1b"], LinearRelative(Normal(0.0, 1.0)),
                  multihypo=[1.0, 0.5, 0.5000000000001], graphinit=False)
    for fl in fg.lsf():
        certain, uncertain, weights = parse_multihypo(
            fg.factor(fl).multihypo)
        assert abs(sum(weights) - 1.0) < 1e-6
