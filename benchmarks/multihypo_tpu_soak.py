"""TPU multihypo/init statistics soak (VERDICT r1 item 9).

Runs the fourdoor incremental multimodal sequence (reference
test/fourdoortest.jl:12-54) and a 3-door multihypo association scenario
(reference testMultiHypo3Door.jl structure) at N=128 ON THE REAL TPU
BACKEND and asserts the reference's own mode-mass acceptance bars — the
guard against statistical drift of the fused-chain / nullSurplus /
batched-LM paths on hardware (the CI suite runs these on CPU only).

Run: ``python benchmarks/multihypo_tpu_soak.py`` → one JSON line
{"soak": "multihypo_tpu", "ok": true, ...} plus per-stage stderr notes.
Exits non-zero on any violated bar.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
# keep XLA per-fusion cache paths OUT of the compile options: they embed
# the cache DIRECTORY PATH into every cache key, so entries only ever hit
# from the exact same directory (bisected 2026-08-21: a copied cache got
# ZERO hits until this was disabled; with it, 42/42 hits and 53s -> 13s)
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402


def _mass(fg, v, c, tol):
    p = np.asarray(fg.points(v)[:, 0])
    return float(np.mean(np.abs(p - c) < tol))


def fourdoor_stage(checks):
    from incrementalinference.jl_tpu import solve_tree
    from incrementalinference.jl_tpu.canonical import fourdoor_sequence
    from incrementalinference.jl_tpu.config import SolverParams

    fg, steps = fourdoor_sequence(params=SolverParams(N=128))
    steps[0]()
    tree = solve_tree(fg)
    for c in (-100, 0, 100, 300):
        checks.append((f"fourdoor s1 mode@{c}", _mass(fg, "x1", c, 20.0),
                       ">", 0.08))
    steps[1]()
    tree = solve_tree(fg, old_tree=tree)
    checks.append(("fourdoor s2 x1 {-100,0}",
                   _mass(fg, "x1", -100, 20.0) + _mass(fg, "x1", 0, 20.0),
                   ">", 0.8))
    checks.append(("fourdoor s2 x1 @300", _mass(fg, "x1", 300, 20.0),
                   "<", 0.1))
    steps[2]()
    solve_tree(fg, old_tree=tree)
    for v, c in [("x1", 0.0), ("x2", 50.0), ("x3", 100.0), ("x4", 300.0)]:
        checks.append((f"fourdoor s3 {v}@{c}", _mass(fg, v, c, 20.0),
                       ">=", 0.8))


def threedoor_stage(checks):
    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             SolverParams, initfg,
                                             solve_tree)

    fg = initfg(SolverParams(N=128, gibbs_iters=5))
    doors = {"l0": 0.0, "l1": 10.0, "l2": 20.0, "l3": 40.0}
    for lbl, c in doors.items():
        fg.add_variable(lbl, ContinuousScalar)
        fg.add_factor([lbl], Prior(Normal(c, 0.01)))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0", "l0", "l1", "l2", "l3"],
                  LinearRelative(Normal(0.0, 0.25)),
                  multihypo=[1.0, 0.25, 0.25, 0.25, 0.25])
    solve_tree(fg)
    masses = [_mass(fg, "x0", c, 3.0) for c in doors.values()]
    checks.append(("3door x0 total mass", sum(masses), ">", 0.75))
    checks.append(("3door x0 multimodality",
                   float(sum(m > 0.08 for m in masses)), ">=", 3.0))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 0.1)))
    fg.add_factor(["x1", "l0", "l1", "l2", "l3"],
                  LinearRelative(Normal(0.0, 0.25)),
                  multihypo=[1.0, 0.25, 0.25, 0.25, 0.25])
    solve_tree(fg)
    checks.append(("3door x1 consistent {10,20}",
                   _mass(fg, "x1", 10.0, 3.0) + _mass(fg, "x1", 20.0, 3.0),
                   ">", 0.6))
    checks.append(("3door x1 inconsistent",
                   sum(_mass(fg, "x1", c, 3.0)
                       for c in (0.0, 40.0, 30.0, 50.0)), "<", 0.25))
    for lbl, c in doors.items():
        checks.append((f"3door {lbl} pinned", _mass(fg, lbl, c, 1.0),
                       ">", 0.9))


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    checks = []
    t0 = time.time()
    fourdoor_stage(checks)
    t_four = time.time() - t0
    t0 = time.time()
    threedoor_stage(checks)
    t_three = time.time() - t0

    ops = {">": lambda a, b: a > b, ">=": lambda a, b: a >= b,
           "<": lambda a, b: a < b}
    failed = [(n, v, op, bar) for n, v, op, bar in checks
              if not ops[op](v, bar)]
    for n, v, op, bar in checks:
        mark = "ok " if ops[op](v, bar) else "FAIL"
        print(f"# {mark} {n}: {v:.3f} {op} {bar}", file=sys.stderr)
    print(json.dumps({
        "soak": "multihypo_tpu", "N": 128,
        "ok": not failed, "checks": len(checks), "failed": len(failed),
        "fourdoor_wall_s": round(t_four, 2),
        "threedoor_wall_s": round(t_three, 2),
        "device": str(dev),
    }), flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
