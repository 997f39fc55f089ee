"""Generic API surface parity: distribution dimensions, graph existence
checks, variable/factor comparison, special measurement samplers
(reference testDistributionsGeneric.jl, basicGraphsOperations.jl,
testCompareVariablesFactors.jl, testSpecialSampler.jl,
TestModuleFunctions.jl)."""

import copy

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, FactorModel,
                                         LinearRelative, MvNormal, Normal,
                                         Prior, Uniform, compare_graphs,
                                         compare_variables, init_variable,
                                         initfg, register_factor_model,
                                         solve_tree)
from incrementalinference.jl_tpu.beliefs import make_belief
from incrementalinference.jl_tpu.manifolds import Euclidean


def test_distribution_dimensions():
    """getDimension equivalents (reference testDistributionsGeneric.jl)."""
    assert Uniform(0.0, 1.0).dim == 1
    assert Normal(0.0, 1.0).dim == 1
    assert MvNormal([1.0, 1.0, 0.1], [1.0, 1.0, 1.0]).dim == 3
    b = make_belief(Euclidean(1), jnp.zeros((100, 1)))
    assert b.points.shape[1] == 1


def test_graph_exists():
    """exists(fg, label) for variables and factors (reference
    basicGraphsOperations.jl:7-22)."""
    fg = initfg()
    fg.add_variable("x1", ContinuousScalar)
    fg.add_variable("x2", ContinuousScalar)
    f = fg.add_factor(["x1", "x2"], LinearRelative(Normal(0.0, 1.0)),
                      graphinit=False)
    fg.add_factor(["x2"], Prior(Normal(0.0, 1.0)), graphinit=False)
    assert fg.exists("x1")
    assert not fg.exists("l13")
    assert fg.exists(f.label)


def test_compare_variables_and_graphs():
    """compare infra detects equality and belief changes (reference
    testCompareVariablesFactors.jl semantics)."""
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    fg2 = copy.deepcopy(fg)
    assert compare_graphs(fg, fg2)
    assert compare_variables(fg.var("x0"), fg2.var("x0"))

    # a solve moves beliefs -> compare must detect the difference
    solve_tree(fg2)
    assert not compare_variables(fg.var("x0"), fg2.var("x0"))
    assert not compare_graphs(fg, fg2)


class _QuirkSampler(FactorModel):
    """Factor whose measurement sampler depends on its own state — the
    reference's specialSampler/getSample customization point
    (testSpecialSampler.jl)."""

    def __init__(self, Z, offset):
        self.Z = Z
        self.offset = offset

    @property
    def zdim(self):
        return self.Z.dim

    def sample(self, key, n):
        return self.Z.sample(key, n) + self.offset

    def residual(self, z, x1, x2):
        return x2 - (x1 + z)

    def mean_cov(self):
        mu, cov = self.Z.mean_cov()
        return mu + self.offset, cov


register_factor_model(_QuirkSampler, ("Z", "offset"))


def test_special_sampler_factor_solves():
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.3)))
    fg.add_factor(["x0", "x1"],
                  _QuirkSampler(Normal(2.0, 0.3), jnp.asarray([5.0])))
    solve_tree(fg)
    p = np.asarray(fg.points("x1")[:, 0])
    assert abs(p.mean() - 7.0) < 0.8, p.mean()     # 0 + (2+5)


def test_deepcopy_independent_memory():
    """Mutating a deep copy must not leak into the original graph
    (reference typeReturnMemRef.jl / compare-infra assumptions)."""
    fg = initfg()
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 1.0)))
    before = np.asarray(fg.points("x0")).copy()
    fg2 = copy.deepcopy(fg)
    init_variable(fg2, "x0", [np.full(1, 99.0) for _ in range(100)])
    np.testing.assert_allclose(np.asarray(fg.points("x0")), before)
    assert abs(float(np.mean(np.asarray(fg2.points("x0")))) - 99.0) < 1e-6
