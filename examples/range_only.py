"""Range-only multimodal localization (reference generateGraph_EuclidDistance,
src/services/CanonicalGraphExamples.jl:242-270, and testEuclidDistance.jl).

Two anchors at (100,0) and (0,100) each measure a 100 m range to an unknown
landmark.  Each range alone is a ring; their product is BIMODAL — the two
ring intersections at (0,0) and (100,100).  A third range collapses the
ambiguity.  Run: PYTHONPATH=. python examples/range_only.py
"""

import numpy as np

from incrementalinference.jl_tpu import (ContinuousEuclid, EuclidDistance,
                                         MvNormal, Normal, Prior, initfg,
                                         solve_tree)


def mode_mass(fg, v, center, tol=25.0):
    p = np.asarray(fg.points(v))
    d = np.linalg.norm(p - np.asarray(center), axis=1)
    return round(float(np.mean(d < tol)), 2)


def main():
    fg = initfg()
    fg.add_variable("x1", ContinuousEuclid(2))
    fg.add_factor(["x1"], Prior(MvNormal([100.0, 0.0], [1.0, 1.0])))
    fg.add_variable("x2", ContinuousEuclid(2))
    fg.add_factor(["x2"], Prior(MvNormal([0.0, 100.0], [1.0, 1.0])))

    fg.add_variable("l1", ContinuousEuclid(2))
    fg.add_factor(["x1", "l1"], EuclidDistance(Normal(100.0, 1.0)))
    fg.add_factor(["x2", "l1"], EuclidDistance(Normal(100.0, 1.0)))

    solve_tree(fg)
    print("two ranges → bimodal landmark:",
          {"(0,0)": mode_mass(fg, "l1", (0.0, 0.0)),
           "(100,100)": mode_mass(fg, "l1", (100.0, 100.0))})

    # a third anchor disambiguates
    fg.add_variable("x3", ContinuousEuclid(2))
    fg.add_factor(["x3"], Prior(MvNormal([100.0, 100.0], [1.0, 1.0])))
    fg.add_factor(["x3", "l1"], EuclidDistance(Normal(141.42, 1.0)))
    solve_tree(fg)
    print("three ranges → unimodal:",
          {"(0,0)": mode_mass(fg, "l1", (0.0, 0.0)),
           "(100,100)": mode_mass(fg, "l1", (100.0, 100.0))})


if __name__ == "__main__":
    main()
