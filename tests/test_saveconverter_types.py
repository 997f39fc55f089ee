"""Converter-type dispatch from extending namespaces (reference
test/saveconvertertypes.jl): a packed-type converter defined OUTSIDE the
core package — here, a user model class defined in this test module — must
resolve through the serialization dispatch registry, not through anything
hard-coded in the package."""

import numpy as np

from incrementalinference.jl_tpu import (Normal, PriorModel,
                                         register_factor_model)
from incrementalinference.jl_tpu.serialization.packed import (
    pack_factor_model, register_fn, unpack_factor_model, _fn_name)


class ExtendT1(PriorModel):
    """User type living in the 'extending namespace' (this test module) —
    the analogue of saveconvertertypes.jl's Extend.T1."""

    def __init__(self, Z):
        self.Z = Z

    @property
    def zdim(self):
        return 1

    def sample(self, key, n):
        return self.Z.sample(key, n)

    def residual(self, meas, p):
        return meas - p

    def mean_cov(self):
        return self.Z.mean_cov()


register_factor_model(ExtendT1, children=("Z",))


def test_extending_namespace_converter_resolves():
    """reference saveconvertertypes.jl:30-34 — convertsave(T1()) must
    produce the extension's own packed type: packing a model the core
    package has never heard of dispatches to the registry entry created at
    registration time, and unpacking restores the extension class."""
    m = ExtendT1(Normal(3.0, 0.5))
    packed = pack_factor_model(m)
    # the packed tag carries the extension type's own name (the
    # getfield(module, Symbol("Packed$(name)")) equivalent)
    assert packed["_type"] == "Custom:ExtendT1"
    m2 = unpack_factor_model(packed)
    assert type(m2) is ExtendT1
    mu, cov = m2.mean_cov()
    assert abs(float(np.asarray(mu).reshape(())) - 3.0) < 1e-9


def test_unregistered_type_raises_clearly():
    """A packed tag whose type was never registered in this process must
    fail with an actionable error (reference behavior: convert throws a
    MethodError naming the missing converter)."""
    import pytest

    with pytest.raises(TypeError, match="not registered"):
        unpack_factor_model({"_type": "Custom:NeverHeardOfIt",
                             "children": {}, "aux": {}})


def test_registered_function_round_trip():
    """register_fn: callables referenced by packed models (ODE dynamics
    etc.) resolve by registered name from the extending namespace."""

    def my_dynamics(x, t):
        return x

    register_fn("test_saveconverter.my_dynamics", my_dynamics)
    assert _fn_name(my_dynamics) == "test_saveconverter.my_dynamics"
