"""The classic fourdoor multimodal 1-D robot (reference test/fourdoortest.jl).

Run:  PYTHONPATH=.. python fourdoor.py   (or from the repo root with -m)
"""

import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Mixture, Normal, Prior, initfg,
                                         solve_tree)


def modes(fg, v, centers, tol=20.0):
    p = np.asarray(fg.points(v)[:, 0])
    return {c: round(float(np.mean(np.abs(p - c) < tol)), 2)
            for c in centers if np.mean(np.abs(p - c) < tol) > 0.05}


def main():
    fg = initfg()
    door = Mixture(Prior, [Normal(-100, 3), Normal(0, 3), Normal(100, 3),
                           Normal(300, 3)], [0.25] * 4)

    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x1"], door)                    # first door sighting
    tree = solve_tree(fg)
    print("after 1 sighting, x1 modes:", modes(fg, "x1", [-100, 0, 100, 300]))

    fg.add_variable("x2", ContinuousScalar)
    fg.add_factor(["x1", "x2"], LinearRelative(Normal(50.0, 2.0)))
    fg.add_variable("x3", ContinuousScalar)
    fg.add_factor(["x2", "x3"], LinearRelative(Normal(50.0, 4.0)))
    fg.add_factor(["x3"], door)                    # second sighting
    tree = solve_tree(fg, old_tree=tree)
    print("after 2 sightings, x1 modes:", modes(fg, "x1", [-100, 0, 100, 300]))

    fg.add_variable("x4", ContinuousScalar)
    fg.add_factor(["x3", "x4"], LinearRelative(Normal(200.0, 4.0)))
    fg.add_factor(["x4"], door)                    # third sighting
    solve_tree(fg, old_tree=tree)
    for v in ("x1", "x2", "x3", "x4"):
        p = np.asarray(fg.points(v)[:, 0])
        print(f"{v}: mean={p.mean():7.1f}  std={p.std():5.1f}")


if __name__ == "__main__":
    main()
