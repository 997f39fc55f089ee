"""Parametric solver at scale (VERDICT r4 item #7): LineStep(300),
LineStep(1000), and an SE(3) chain of >=200 poses — wall, peak H size,
and accuracy rows for BASELINE.

The solver assembles DENSE normal equations (H = JᵀJ, D x D).  These
rows measure where that stops being fine: at D total tangent dof the
memory is D²·4 B and the LM solve is O(D³) MXU work — on a v5e-1 the
crossover where dense H dominates is far beyond the reference's own
operating sizes (ParametricManopt.jl's sparse-coloring machinery exists
because CPU Julia pays the dense cost at much smaller D).

Usage: python benchmarks/parametric_scale.py [--only linestep300,...]
"""
import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402


def _row(name, build, truth_of, n_solves=3, autoinit=False):
    from incrementalinference.jl_tpu.parametric import solve_graph_parametric
    from incrementalinference.jl_tpu.parametric.solver import (
        ParametricProblem, autoinit_parametric)

    fg = build()
    prob = ParametricProblem(fg)
    D = prob.total_dof

    def solve(fg):
        if autoinit:
            # long nonlinear chains (SE(3)) need the reference's
            # autoinitParametric! pass first: batch LM from identity
            # diverges once the chain curls far from the linearization
            autoinit_parametric(fg)
        solve_graph_parametric(fg)

    t0 = time.time()
    solve(fg)
    cold = time.time() - t0
    walls = []
    for _ in range(n_solves):
        fg = build()
        t0 = time.time()
        solve(fg)
        jax.block_until_ready(fg.var(fg.ls()[0]).parametric_point)
        walls.append(time.time() - t0)
    errs = truth_of(fg)
    print(f"# {name}: D={D} dof, dense H {D*D*4/1e6:.1f} MB, "
          f"cold {cold:.2f}s, warm {min(walls):.3f}s (median "
          f"{sorted(walls)[len(walls)//2]:.3f}), max err {max(errs):.4f}"
          f"{' [autoinit+solve]' if autoinit else ''}",
          flush=True)


def linestep(n):
    from incrementalinference.jl_tpu.canonical import generate_line_step

    def build():
        return generate_line_step(n, graphinit=False)

    def truth(fg):
        errs = []
        for v in fg.ls():
            i = int(v[1:]) if v.startswith("x") else int(v[2:])
            errs.append(abs(float(np.asarray(
                fg.var(v).parametric_point).ravel()[0]) - float(i)))
        return errs
    return build, truth


def se3_chain(n_poses):
    from incrementalinference.jl_tpu import initfg
    from incrementalinference.jl_tpu.config import SolverParams
    from incrementalinference.jl_tpu.distributions import MvNormal
    from incrementalinference.jl_tpu.graph import VariableType
    from incrementalinference.jl_tpu.manifolds import SE3
    from incrementalinference.jl_tpu.models.factors import (ManifoldFactor,
                                                            ManifoldPrior)

    man = SE3()
    Pose3 = VariableType("Pose3", man)
    step = np.array([1.0, 0.0, 0.05, 0.0, 0.0, 0.02], np.float32)

    def build():
        fg = initfg(SolverParams(N=8, graphinit=False))
        ident = np.asarray(man.identity())
        fg.add_variable("x0", Pose3)
        fg.add_factor(["x0"], ManifoldPrior(
            man, ident, MvNormal(np.zeros(6), [0.01] * 6)), graphinit=False)
        for i in range(1, n_poses):
            fg.add_variable(f"x{i}", Pose3)
            fg.add_factor([f"x{i-1}", f"x{i}"], ManifoldFactor(
                man, MvNormal(step, [0.01] * 6)), graphinit=False)
        return fg

    def truth(fg):
        # ground truth by composing the step transform; compare translation
        cur = np.asarray(man.identity())
        errs = []
        for i in range(n_poses):
            v = fg.var(f"x{i}")
            est = np.asarray(v.parametric_point)
            errs.append(float(np.linalg.norm(est[:3] - cur[:3])))
            import jax.numpy as jnp
            cur = np.asarray(man.exp(jnp.asarray(cur)[None, :],
                                     jnp.asarray(step)[None, :])[0])
        return errs
    return build, truth


CASES = {
    "linestep300": lambda: _row("LineStep(300) parametric",
                                *linestep(300)),
    "linestep1000": lambda: _row("LineStep(1000) parametric",
                                 *linestep(1000)),
    "se3chain200": lambda: _row("SE(3) chain 200 poses parametric",
                                *se3_chain(200), n_solves=2,
                                autoinit=True),
}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="")
    a = ap.parse_args()
    only = set(a.only.split(",")) if a.only else set(CASES)
    for name, fn in CASES.items():
        if name in only:
            fn()
