"""Prior balance, mixture sampling/posterior statistics, and custom user
factors (reference priorusetest.jl, testMixtureLinearConditional.jl,
testMixturePrior.jl, testCalcFactorHypos.jl)."""

import os

import numpy as np
import pytest

from incrementalinference.jl_tpu import (AliasingScalarSampler,
                                         ContinuousScalar, FactorModel,
                                         LinearRelative, Mixture, Normal,
                                         Prior, SolverParams, approx_conv_belief,
                                         init_variable, initfg, load_graph,
                                         register_factor_model, sample_factor,
                                         save_graph, solve_tree)


@pytest.mark.parametrize("graphinit", [False, True])
def test_two_priors_chain_means_balance(graphinit):
    """Two opposing priors (-1, +1) joined by near-rigid relatives: every
    posterior mean lands near 0 and all variables agree (reference
    priorusetest.jl:19-58, tolerance bars :50-57)."""
    fg = initfg(SolverParams(N=100, graphinit=graphinit))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(-1.0, 1.0)))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_variable("x2", ContinuousScalar)
    fg.add_factor(["x2"], Prior(Normal(+1.0, 1.0)))
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(0.0, 0.01)))
    fg.add_factor(["x1", "x2"], LinearRelative(Normal(0.0, 0.01)))

    solve_tree(fg)
    means = [float(np.mean(np.asarray(fg.points(v)))) for v in
             ("x0", "x1", "x2")]
    for m in means:
        assert abs(m) < 1.0, means          # reference atol=1.0 (:50-52)
    mu = np.mean(means)
    assert all(abs(m - mu) < 0.4 for m in means), means  # :55-57


def test_two_priors_landmark_web_means_balance():
    """Denser version with two landmarks seen from both ends (reference
    priorusetest.jl:63-118)."""
    fg = initfg(SolverParams(N=100))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(-1.0, 1.0)))
    fg.add_variable("l0", ContinuousScalar)
    fg.add_factor(["l0"], Prior(Normal(+1.0, 1.0)))
    fg.add_variable("l1", ContinuousScalar)
    fg.add_factor(["x0", "l0"], LinearRelative(Normal(0.0, 0.01)))
    fg.add_factor(["x0", "l1"], LinearRelative(Normal(0.0, 0.01)))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(0.0, 0.01)))
    fg.add_variable("x2", ContinuousScalar)
    fg.add_factor(["x1", "x2"], LinearRelative(Normal(0.0, 0.01)))
    fg.add_factor(["x2", "l0"], LinearRelative(Normal(0.0, 0.01)))
    fg.add_factor(["x2", "l1"], LinearRelative(Normal(0.0, 0.01)))

    solve_tree(fg)
    means = [float(np.mean(np.asarray(fg.points(v)))) for v in
             ("x0", "x1", "x2", "l0", "l1")]
    for m in means[:3]:
        assert abs(m) < 1.0, means          # reference :108-110
    for m in means[3:]:
        assert abs(m) < 1.2, means          # reference :111-112
    mu = np.mean(means)
    assert all(abs(m - mu) < 0.4 for m in means), means


def _mode_stats(pts):
    n = pts.shape[0]
    return {
        "lo": np.sum((-5 < pts) & (pts < 5)) / n,
        "hi": np.sum((5 < pts) & (pts < 15)) / n,
        "above": np.sum(pts > 15) / n,
        "below": np.sum(pts < -5) / n,
        "valley": np.sum((3 < pts) & (pts < 7)) / n,
    }


def test_mixture_prior_conv_sampling_bimodal():
    """approxConv through Mixture(Prior, (N(0,1), N(10,1))) is bimodal with
    an empty valley (reference testMixtureLinearConditional.jl:15-42)."""
    fg = initfg(SolverParams(N=200))
    fg.add_variable("x0", ContinuousScalar)
    f = fg.add_factor(["x0"], Mixture(Prior,
                                      [Normal(0.0, 1.0), Normal(10.0, 1.0)],
                                      [0.5, 0.5]))
    bel = approx_conv_belief(fg, f.label, "x0")
    s = _mode_stats(np.asarray(bel.points[:, 0]))
    assert s["lo"] > 0.2 and s["hi"] > 0.2, s     # reference :31-32
    assert s["above"] < 0.1 and s["below"] < 0.1, s
    assert s["valley"] < 0.1, s


def test_mixture_relative_conv_sampling_bimodal():
    """approxConv through Mixture(LinearRelative, …) from a pinned x0
    (reference testMixtureLinearConditional.jl:45-69)."""
    fg = initfg(SolverParams(N=200))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)), graphinit=False)
    init_variable(fg, "x0", [np.zeros(1) for _ in range(200)])
    f = fg.add_factor(["x0", "x1"],
                      Mixture(LinearRelative,
                              [Normal(0.0, 1.0), Normal(10.0, 1.0)],
                              [0.5, 0.5]), graphinit=False)
    bel = approx_conv_belief(fg, f.label, "x1")
    s = _mode_stats(np.asarray(bel.points[:, 0]))
    assert s["lo"] > 0.2 and s["hi"] > 0.2, s
    assert s["above"] < 0.1 and s["below"] < 0.1, s
    assert s["valley"] < 0.1, s


def test_simple_mixture_posterior_split_stats():
    """Posterior of x1 under Prior(N(0,0.1)) at x0 and a ±1 mixture relative
    splits into two modes at ±1 (reference
    testMixtureLinearConditional.jl:135-200; mean bars :185-190)."""
    fg = initfg(SolverParams(N=150))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.1)))
    fg.add_factor(["x0", "x1"],
                  Mixture(LinearRelative,
                          [Normal(-1.0, 0.1), Normal(1.0, 0.1)],
                          [0.5, 0.5]))
    solve_tree(fg)

    x0 = np.asarray(fg.points("x0")[:, 0])
    assert abs(x0.mean()) < 0.15, x0.mean()       # reference atol=0.1 (:174)
    assert abs(x0.std() - 0.1) < 0.07, x0.std()   # reference atol=0.05 (:176)

    x1 = np.asarray(fg.points("x1")[:, 0])
    pos, neg = x1[x1 >= 0], x1[x1 < 0]
    # both modes populated and centred at ±1
    assert len(pos) > 0.2 * len(x1) and len(neg) > 0.2 * len(x1)
    assert abs(pos.mean() - 1.0) < 0.2, pos.mean()  # reference atol=0.1
    assert abs(neg.mean() + 1.0) < 0.2, neg.mean()


def test_mixture_prior_with_alias_sampler(tmp_path):
    """Mixture(Prior, (Normal(-5,1), AliasingScalarSampler)) keeps a
    particle balance across -2.5 through conv AND solve, and survives a
    save/load round trip (reference testMixturePrior.jl:11-92)."""
    rng = np.random.default_rng(42)
    v = rng.random(50)
    v[19:29] += 5 * rng.random(10)
    v /= v.sum()
    bss = AliasingScalarSampler(np.arange(1.0, 51.0), v)

    N = 100
    fg = initfg(SolverParams(N=N))
    fg.add_variable("x0", ContinuousScalar)
    f1 = fg.add_factor(["x0"], Mixture(Prior, [Normal(-5.0, 1.0), bss],
                                       [0.5, 0.5]))

    smpls = np.asarray(approx_conv_belief(fg, f1.label, "x0").points[:, 0])
    assert abs(np.sum(smpls < -2.5) - np.sum(smpls > -2.5)) < 0.35 * N

    solve_tree(fg)
    marg = np.asarray(fg.points("x0")[:, 0])
    assert abs(np.sum(marg < -2.5) - np.sum(marg > -2.5)) < 0.35 * N

    # serialization round trip keeps the mixture + sampler solvable
    path = os.path.join(tmp_path, "fg_bss.json")
    save_graph(fg, path)
    fg2 = load_graph(path)
    solve_tree(fg2)
    marg2 = np.asarray(fg2.points("x0")[:, 0])
    assert abs(np.sum(marg2 < -2.5) - np.sum(marg2 > -2.5)) < 0.35 * N


class _MyFactor(FactorModel):
    """User-defined relative factor (reference testCalcFactorHypos.jl:11-30)."""

    def __init__(self, Z):
        self.Z = Z

    @property
    def zdim(self):
        return self.Z.dim

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def residual(self, z, x1, x2):
        return x2 - (x1 + z)

    def mean_cov(self):
        return self.Z.mean_cov()


register_factor_model(_MyFactor)


def test_custom_factor_multihypo_api():
    """Custom FactorModel + multihypo plumbing: weight-length validation,
    is_multihypo, sampleFactor, and a full tree solve (reference
    testCalcFactorHypos.jl:34-81)."""
    fg = initfg(SolverParams(N=75))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_variable("x1_a", ContinuousScalar)
    fg.add_variable("x1_b", ContinuousScalar)
    f0 = fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))

    mf = _MyFactor(Normal(10.0, 1.0))
    # reference test #424: wrong-length multihypo must throw (:52)
    with pytest.raises(ValueError):
        fg.add_factor(["x0", "x1_a", "x1_b"], mf, multihypo=[0.5, 0.5])

    f1 = fg.add_factor(["x0", "x1_a", "x1_b"], mf, multihypo=[1.0, 0.5, 0.5])
    assert not f0.is_multihypo
    assert f1.is_multihypo

    meas = sample_factor(fg, f1.label, 10)
    assert meas.shape == (10, 1)

    solve_tree(fg)
    # x0 pinned at 0; the association splits x1_a/x1_b around 10
    assert abs(float(np.mean(np.asarray(fg.points("x0")))) ) < 1.0
    for lbl in ("x1_a", "x1_b"):
        pts = np.asarray(fg.points(lbl)[:, 0])
        assert np.mean(np.abs(pts - 10.0) < 6.0) > 0.35, (lbl, pts.mean())


def test_manikde_prior_and_mixture_component(tmp_path):
    """manikde! parity: a KDE belief as a Prior measurement and as a
    Mixture component, surviving pack/unpack with identical mass
    (reference testlocalconstraintexamples.jl:8-46,
    testMixtureLinearConditional.jl:86-128 'fancy' component)."""
    import os

    import jax

    from incrementalinference.jl_tpu import manikde
    from incrementalinference.jl_tpu.ops.deconv import mmd

    rng = np.random.default_rng(11)
    pd = manikde(ContinuousScalar, np.zeros((100, 1)), bw=[3.0])

    fg = initfg(SolverParams(N=100))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x1"], Prior(pd))
    fg.add_variable("x2", ContinuousScalar)
    f2 = fg.add_factor(["x1", "x2"], LinearRelative(Normal(50.0, 2.0)))

    bel = approx_conv_belief(fg, f2.label, "x2")
    m = float(np.mean(np.asarray(bel.points[:, 0])))
    assert abs(m - 50.0) < 15.0                     # reference :38 bar
    solve_tree(fg)
    m = float(np.mean(np.asarray(fg.points("x2")[:, 0])))
    assert abs(m - 50.0) < 15.0

    # mixture with a KDE ("fancy") and a parametric ("naive") component
    fancy = manikde(ContinuousScalar, rng.normal(0.0, 1.0, (75, 1)))
    mr = Mixture(LinearRelative, [fancy, Normal(0.0, 10.0)], [0.4, 0.6])
    fg.add_variable("x3", ContinuousScalar)
    fg.add_factor(["x2", "x3"], mr)

    path = os.path.join(tmp_path, "mkd_fg.json")
    save_graph(fg, path)
    fg2 = load_graph(path)
    mr2 = next(fg2.factor(fl).model for fl in fg2.lsf()
               if isinstance(fg2.factor(fl).model, Mixture))
    a, b = mr.components[0], mr2.components[0]
    # identical KDE after the round trip (reference mmd(A,B) < 1e-6)
    d = float(mmd(a.points, b.points))
    assert d < 1e-6, d
    solve_tree(fg2)
    m3 = float(np.mean(np.asarray(fg2.points("x3")[:, 0])))
    assert abs(m3 - 50.0) < 20.0
