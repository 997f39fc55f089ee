"""SE(3)/SO(3)/Sphere2 hardware soak (VERDICT r2 item 8): the quaternion
small-angle branches + jacfwd paths run in f32 on the real chip, where
they could drift vs the CPU test rig — this soak re-runs the reference-
tolerance manifold bars on hardware.

Fixtures mirror the reference's manifold test territory
(test/testSpecialEuclidean2Mani.jl, testSphereMani.jl,
testSpecialOrthogonalMani.jl): an SE(3) pose chain with a loop-closing
prior (nonparametric + parametric cross-check), an SO(3) prior
concentration, and a Sphere2 prior.

Usage: python benchmarks/se3_tpu_soak.py
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
# keep XLA per-fusion cache paths OUT of the compile options: they embed
# the cache DIRECTORY PATH into every cache key, so entries only ever hit
# from the exact same directory (bisected 2026-08-21: a copied cache got
# ZERO hits until this was disabled; with it, 42/42 hits and 53s -> 13s)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from incrementalinference.jl_tpu import (ManifoldFactor,  # noqa: E402
                                         ManifoldPrior, MvNormal,
                                         VariableType, initfg, solve_tree)
from incrementalinference.jl_tpu.manifolds import SE3, SO3, Sphere2  # noqa: E402


def se3_chain():
    se3 = SE3()
    pose3 = VariableType("Pose3", se3)
    fg = initfg()
    fg.add_variable("x0", pose3)
    fg.add_factor(["x0"], ManifoldPrior(
        se3, se3.identity(), MvNormal([0.0] * 6, [0.05] * 3 + [0.02] * 3)))
    # helix-ish motion: forward + climb + yaw
    xi = jnp.asarray([1.0, 0.0, 0.2, 0.0, 0.0, 0.3])
    z = MvNormal([1.0, 0.0, 0.2, 0.0, 0.0, 0.3],
                 [0.05, 0.05, 0.05, 0.02, 0.02, 0.02])
    n = 5
    for i in range(1, n + 1):
        fg.add_variable(f"x{i}", pose3)
        fg.add_factor([f"x{i-1}", f"x{i}"], ManifoldFactor(se3, z))

    t0 = time.time()
    solve_tree(fg)
    jax.block_until_ready(fg.points(f"x{n}"))
    wall = time.time() - t0

    truth = se3.identity()
    worst = 0.0
    for i in range(1, n + 1):
        truth = se3.compose(truth, se3.Exp(xi))
        p = jnp.asarray(np.asarray(fg.points(f"x{i}")))
        err = np.asarray(se3.dist(p, truth))
        frac = float(np.mean(err < 0.8))
        worst = max(worst, 1.0 - frac)
        # reference-style tolerance window (testSpecialEuclidean2Mani.jl
        # idiom: most particles within a fixed window of truth)
        assert frac > 0.7, (i, frac, np.asarray(truth))
    print(f"# SE(3) chain ({n} poses): solve {wall:.2f}s, worst "
          f"out-of-window fraction {worst:.2f}", flush=True)

    # parametric cross-check on the same graph: means must land on the
    # composed ground truth almost exactly
    from incrementalinference.jl_tpu.parametric import solve_graph_parametric
    t0 = time.time()
    solve_graph_parametric(fg)
    truth = se3.identity()
    for i in range(1, n + 1):
        truth = se3.compose(truth, se3.Exp(xi))
        mu = jnp.asarray(np.asarray(fg.var(f"x{i}").parametric_point))
        d = float(se3.dist(mu[None, :], truth)[0])
        assert d < 0.05, (i, d)
    print(f"# SE(3) parametric cross-check: {time.time()-t0:.2f}s, "
          f"final-pose dist {d:.4f}", flush=True)


def so3_prior():
    so3 = SO3()
    rot = VariableType("Rotation3", so3)
    fg = initfg()
    fg.add_variable("r", rot)
    q0 = so3.exp(so3.identity(), jnp.asarray([0.2, -0.1, 0.4]))
    fg.add_factor(["r"], ManifoldPrior(so3, q0, MvNormal([0.0] * 3,
                                                         [0.05] * 3)))
    p = jnp.asarray(np.asarray(fg.points("r")))
    d = np.asarray(so3.dist(p, q0))
    frac = float(np.mean(d < 0.2))
    assert frac > 0.9, frac
    print(f"# SO(3) prior concentration: {frac:.2f} within 0.2 rad",
          flush=True)


def sphere_prior():
    s2 = Sphere2()
    sph = VariableType("Sphere2", s2)
    fg = initfg()
    fg.add_variable("s", sph)
    p0 = jnp.asarray([0.0, 0.0, 1.0])
    fg.add_factor(["s"], ManifoldPrior(s2, p0, MvNormal([0.0] * 2,
                                                        [0.05] * 2)))
    p = jnp.asarray(np.asarray(fg.points("s")))
    norms = np.asarray(jnp.linalg.norm(p, axis=-1))
    assert np.max(np.abs(norms - 1.0)) < 1e-3      # stays ON the sphere
    d = np.asarray(s2.dist(p, p0))
    frac = float(np.mean(d < 0.2))
    assert frac > 0.9, frac
    print(f"# Sphere2 prior: {frac:.2f} within 0.2 rad, max |norm-1| "
          f"{np.max(np.abs(norms-1.0)):.1e}", flush=True)


def main():
    print(f"# device: {jax.devices()[0]}")
    se3_chain()
    so3_prior()
    sphere_prior()
    print("PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
