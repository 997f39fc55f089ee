"""Packing/unpacking of graph-related types (reference
test/testgraphpackingconverters.jl): samplable-belief round-trips, packed
factor-node data, packed variable-node data, and manifold-KDE
serialization."""

import os
import tempfile

import jax.numpy as jnp
import numpy as np

from incrementalinference.jl_tpu import (ContinuousScalar, LinearRelative,
                                         Normal, Prior, Uniform, initfg)
from incrementalinference.jl_tpu.beliefs import make_belief
from incrementalinference.jl_tpu.manifolds import Euclidean
from incrementalinference.jl_tpu.serialization import load_graph, save_graph
from incrementalinference.jl_tpu.serialization.packed import (
    pack_belief, pack_distribution, pack_factor_model, unpack_belief,
    unpack_distribution, unpack_factor_model)
from incrementalinference.jl_tpu.utils.compare import (compare_beliefs,
                                                       compare_variables)


def test_samplable_belief_round_trip():
    """reference :11-23 — Uniform() → packed string/dict → back, bounds
    preserved to 1e-10."""
    td = Uniform(0.0, 1.0)
    packed = pack_distribution(td)
    utd = unpack_distribution(packed)
    assert abs(float(td.a) - float(utd.a)) < 1e-10
    assert abs(float(td.b) - float(utd.b)) < 1e-10


def _doors_graph():
    """The reference's fixture (:27-42): x1 with a four-door KDE-backed
    prior, x2 via LinearRelative(Normal(50, 2))."""
    from incrementalinference.jl_tpu import Mixture

    fg = initfg()
    cv = 3.0
    door = Mixture(Prior, [Normal(-100.0, cv), Normal(0.0, cv),
                           Normal(100.0, cv), Normal(300.0, cv)])
    fg.add_variable("x1", ContinuousScalar)
    f1 = fg.add_factor(["x1"], door)
    fg.add_variable("x2", ContinuousScalar)
    f2 = fg.add_factor(["x1", "x2"], LinearRelative(Normal(50.0, 2.0)))
    return fg, f1, f2


def test_packed_function_node_data_round_trip():
    """reference :46-62 — PackedPrior / PackedLinearRelative converters:
    pack the factor's solver data, reconstruct, compare equal."""
    fg, f1, f2 = _doors_graph()

    d1 = pack_factor_model(f1.model)
    m1 = unpack_factor_model(d1)
    assert type(m1).__name__ == "Mixture"
    # component means and weights survive (the reconstFactorData compare)
    mus = sorted(float(np.asarray(c.mean_cov()[0]).reshape(()))
                 for c in m1.components)
    assert np.allclose(mus, [-100.0, 0.0, 100.0, 300.0])

    d2 = pack_factor_model(f2.model)
    m2 = unpack_factor_model(d2)
    assert type(m2).__name__ == "LinearRelative"
    mu, cov = m2.mean_cov()
    assert abs(float(np.asarray(mu).reshape(())) - 50.0) < 1e-9
    assert abs(float(np.asarray(cov).reshape(())) - 4.0) < 1e-6


def test_packed_variable_node_data_round_trip():
    """reference :64-80 — variable node data through the packed schema:
    type, particle count, beliefs, and init state all survive a graph
    save/load."""
    fg, _, _ = _doors_graph()
    with tempfile.TemporaryDirectory() as tmp:
        p = os.path.join(tmp, "g.json")
        save_graph(fg, p)
        fg2 = load_graph(p)
    for lbl in fg.ls():
        va, vb = fg.var(lbl), fg2.var(lbl)
        assert va.vartype.name == vb.vartype.name      # ContinuousScalar
        assert va.N == vb.N
        assert va.initialized == vb.initialized
        if va.is_initialized():
            assert compare_variables(va, vb)


def test_manifold_kernel_density_round_trip():
    """reference :83-102 — a 2-D manifold KDE (points + bandwidth + ipc)
    through the packed form: endpoint points approximately equal, manifold
    and infoPerCoord identical."""
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.normal(size=(100, 2)), jnp.float32)
    mkd = make_belief(Euclidean(2), pts)

    packed = pack_belief(mkd)
    upk = unpack_belief(packed)

    np.testing.assert_allclose(np.asarray(upk.points[0]),
                               np.asarray(mkd.points[0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upk.points[-1]),
                               np.asarray(mkd.points[-1]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(upk.bw), np.asarray(mkd.bw),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(upk.ipc),
                                  np.asarray(mkd.ipc))
    assert compare_beliefs(mkd, upk)


def test_parch_hollow_belief():
    """reference parchDistribution (SerializationMKD.jl) — the hollowed
    (parch=True) form keeps shape metadata but drops the point payload."""
    pts = jnp.ones((64, 2))
    b = make_belief(Euclidean(2), pts)
    packed = pack_belief(b, parch=True)
    assert "points" not in packed and packed["npts"] == 64
    hollow = unpack_belief(packed)
    assert hollow.points.shape == (64, 2)
    assert float(jnp.abs(hollow.points).sum()) == 0.0
