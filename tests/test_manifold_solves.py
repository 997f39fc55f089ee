"""On-manifold end-to-end solves (reference testCircular.jl,
testSpecialEuclidean2Mani.jl, testSphereMani.jl analogues)."""

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (Circular, CircularCircular,
                                         ManifoldFactor, ManifoldPrior,
                                         MvNormal, Normal, PriorCircular,
                                         VariableType, initfg, solve_tree)
from incrementalinference.jl_tpu.manifolds import SE2, SO3, wrap_angle


def test_circular_chain_wraps():
    """Chain of circular factors marching around the circle: estimates must
    wrap instead of accumulating past pi (reference testCircular.jl)."""
    fg = initfg()
    fg.add_variable("c0", Circular)
    fg.add_factor(["c0"], PriorCircular(Normal(0.0, 0.05)))
    step = 2.0 * np.pi / 5.0
    for i in range(1, 6):
        fg.add_variable(f"c{i}", Circular)
        fg.add_factor([f"c{i-1}", f"c{i}"],
                      CircularCircular(Normal(step, 0.05)))
    solve_tree(fg)
    for i in range(6):
        p = np.asarray(fg.points(f"c{i}")[:, 0])
        want = float(wrap_angle(jnp.asarray(i * step)))
        d = np.abs(np.angle(np.exp(1j * (p - want))))
        assert np.mean(d < 0.5) > 0.85, (i, want, p.mean())
    # c5 closed the full circle: it must sit near 0, not near 2*pi
    p5 = np.asarray(fg.points("c5")[:, 0])
    assert np.mean(np.abs(np.angle(np.exp(1j * p5))) < 0.5) > 0.85


def test_se2_pose_chain():
    """SE(2) relative-factor chain solves nonparametrically."""
    se2 = SE2()
    pose2 = VariableType("Pose2", se2)
    fg = initfg()
    fg.add_variable("x0", pose2)
    fg.add_factor(["x0"], ManifoldPrior(
        se2, jnp.zeros(3), MvNormal([0.0] * 3, [0.05, 0.05, 0.02])))
    z = MvNormal([1.0, 0.0, 0.3], [0.05, 0.05, 0.02])
    for i in range(1, 4):
        fg.add_variable(f"x{i}", pose2)
        fg.add_factor([f"x{i-1}", f"x{i}"], ManifoldFactor(se2, z))
    solve_tree(fg)

    # ground truth by composing the exact relative motion
    truth = jnp.zeros(3)
    for i in range(1, 4):
        truth = se2.compose(truth, se2.Exp(jnp.asarray([1.0, 0.0, 0.3])))
        p = np.asarray(fg.points(f"x{i}"))
        err = np.asarray(se2.dist(jnp.asarray(p), truth))
        assert np.mean(err < 0.6) > 0.8, (i, np.asarray(truth), p.mean(0))


def test_so3_prior_concentration():
    so3 = SO3()
    rot = VariableType("Rotation3", so3)
    fg = initfg()
    fg.add_variable("r", rot)
    q0 = so3.exp(so3.identity(), jnp.asarray([0.2, -0.1, 0.4]))
    fg.add_factor(["r"], ManifoldPrior(
        so3, q0, MvNormal([0.0] * 3, [0.05] * 3)))
    p = np.asarray(fg.points("r"))
    d = np.asarray(so3.dist(jnp.asarray(p), q0))
    assert np.mean(d < 0.2) > 0.9


def test_sphere_manifold_ops_and_prior():
    """S² exp/log roundtrip + prior solve (reference testSphereMani.jl)."""
    import jax
    from incrementalinference.jl_tpu.manifolds import Sphere2
    from incrementalinference.jl_tpu import initfg, ManifoldPrior, MvNormal, VariableType

    S = Sphere2()
    key = jax.random.PRNGKey(0)
    p = S.exp(S.identity(), 0.4 * jax.random.normal(key, (2,)))
    X = 0.5 * jax.random.normal(jax.random.PRNGKey(1), (2,))
    q = S.exp(p, X)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q)), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(S.log(p, q)), np.asarray(X),
                               atol=1e-4)

    fg = initfg()
    sph = VariableType("Sphere2", S)
    fg.add_variable("s", sph)
    p0 = S.exp(S.identity(), jnp.asarray([0.3, -0.2]))
    fg.add_factor(["s"], ManifoldPrior(S, p0, MvNormal([0.0, 0.0],
                                                       [0.05, 0.05])))
    pts = np.asarray(fg.points("s"))
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0, atol=1e-4)
    d = np.asarray(S.dist(jnp.asarray(pts), p0))
    assert np.mean(d < 0.2) > 0.9


def test_se2_multihypo_landmark_association():
    """SE(2) pose sees one of two known landmarks (BASELINE config #4:
    SE(2) multimodal MM-iSAM with multihypo data association)."""
    from incrementalinference.jl_tpu import ContinuousEuclid, Prior, initfg, solve_tree
    from incrementalinference.jl_tpu.canonical import _Pose2Point2Bearingless
    from incrementalinference.jl_tpu.distributions import MvNormal as MvN

    se2 = SE2()
    pose2 = VariableType("Pose2", se2)
    fg = initfg()
    fg.add_variable("la", ContinuousEuclid(2))
    fg.add_factor(["la"], Prior(MvN([10.0, 0.0], [0.1, 0.1])))
    fg.add_variable("lb", ContinuousEuclid(2))
    fg.add_factor(["lb"], Prior(MvN([0.0, 10.0], [0.1, 0.1])))
    fg.add_variable("x0", pose2)
    # the robot sees *a* landmark 2m ahead, unknown which
    fg.add_factor(["x0", "la", "lb"],
                  _Pose2Point2Bearingless(MvN([2.0, 0.0], [0.1, 0.1])),
                  multihypo=[1.0, 0.5, 0.5])
    solve_tree(fg)
    p = np.asarray(fg.points("x0"))
    # bimodal pose posterior: near (8,0) facing +x OR near (0,8) facing +y
    d_a = np.linalg.norm(p[:, :2] - np.array([8.0, 0.0]), axis=1)
    d_b = np.linalg.norm(p[:, :2] - np.array([0.0, 8.0]), axis=1)
    close = (d_a < 4.0) | (d_b < 4.0)
    # orientation must point at the selected landmark
    assert np.mean(d_a < 4.0) > 0.1 and np.mean(d_b < 4.0) > 0.1, (
        np.mean(d_a < 4.0), np.mean(d_b < 4.0))
    assert np.mean(close) > 0.5
    # landmarks stay pinned
    la = np.asarray(fg.points("la"))
    assert np.linalg.norm(la.mean(0) - [10.0, 0.0]) < 1.0


def test_hexagonal_nonparam_vs_parametric():
    """SE(2) hexagonal: the nonparametric posterior means must sit near the
    parametric optimum (cross-validation of the conv+product stack on a
    curved manifold with a loop closure)."""
    from incrementalinference.jl_tpu import solve_tree
    from incrementalinference.jl_tpu.canonical import generate_hexagonal
    from incrementalinference.jl_tpu.parametric import solve_graph_parametric

    fg = generate_hexagonal(graphinit=True)
    solve_tree(fg)
    fg2 = generate_hexagonal(graphinit=True)
    solve_graph_parametric(fg2)

    se2 = fg.var("x3").manifold
    for v in ("x1", "x3", "x6"):
        mu_np = fg.var(v).manifold.mean(fg.points(v))
        mu_p = fg2.var(v).parametric_point
        d = float(se2.dist(mu_np, mu_p))
        assert d < 1.5, (v, d, np.asarray(mu_np), np.asarray(mu_p))


def test_translation_group_manifold_prior_factor():
    """TranslationGroup(2) variable with ManifoldPrior + ManifoldFactor
    solves to the composed mean (reference testTranslationMani.jl:35 —
    @defVariable TranslationGroup2, prior at [10,20], relative [1,2])."""
    from incrementalinference.jl_tpu import initfg, solve_tree
    from incrementalinference.jl_tpu.manifolds import Euclidean

    t2 = Euclidean(2)                  # TranslationGroup(2) ≡ R² group
    tg2 = VariableType("TranslationGroup2", t2)
    fg = initfg()
    fg.add_variable("x0", tg2)
    fg.add_factor(["x0"], ManifoldPrior(
        t2, jnp.asarray([10.0, 20.0]), MvNormal([0.0, 0.0], [1.0, 1.0])))
    fg.add_variable("x1", tg2)
    fg.add_factor(["x0", "x1"], ManifoldFactor(
        t2, MvNormal([1.0, 2.0], [0.1, 0.1])))
    solve_tree(fg)
    m0 = np.asarray(fg.points("x0")).mean(0)
    m1 = np.asarray(fg.points("x1")).mean(0)
    np.testing.assert_allclose(m0, [10.0, 20.0], atol=1.0)
    np.testing.assert_allclose(m1, [11.0, 22.0], atol=1.0)
