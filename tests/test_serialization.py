"""Serialization round-trip tests (reference testSaveLoadDFG.jl,
testPackedDistributions.jl, testPackingMixtures.jl, testTreeSaveLoad.jl)."""

import numpy as np
import pytest

from incrementalinference.jl_tpu import distributions as D
from incrementalinference.jl_tpu import models as M
from incrementalinference.jl_tpu import solve_tree
from incrementalinference.jl_tpu.canonical import (fourdoor_sequence,
                                                   generate_kaess)
from incrementalinference.jl_tpu.manifolds import SE2, Circle, Euclidean, Product
from incrementalinference.jl_tpu.serialization import (
    load_graph, load_tree, pack_distribution, pack_factor_model,
    pack_manifold, save_graph, save_tree, unpack_distribution,
    unpack_factor_model, unpack_manifold)
from incrementalinference.jl_tpu.tree import build_tree


@pytest.mark.parametrize("dist", [
    D.Normal(1.5, 0.3), D.MvNormal([1.0, 2.0], [[2.0, 0.5], [0.5, 1.0]]),
    D.Uniform(-1.0, 4.0), D.Rayleigh(2.0), D.Categorical([0.25, 0.75]),
    D.AliasingScalarSampler([0.0, 1.0], [0.4, 0.6]),
], ids=lambda d: type(d).__name__)
def test_distribution_roundtrip(dist):
    d2 = unpack_distribution(pack_distribution(dist))
    assert type(d2) is type(dist)
    m1, c1 = dist.mean_cov()
    m2, c2 = d2.mean_cov()
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), atol=1e-6)


@pytest.mark.parametrize("m", [
    Euclidean(3), Circle(), SE2(), Product(Euclidean(2), Circle()),
], ids=repr)
def test_manifold_roundtrip(m):
    assert unpack_manifold(pack_manifold(m)) == m


def test_mixture_model_roundtrip():
    mix = M.Mixture(M.Prior, [D.Normal(-10, 1), D.Normal(10, 1)], [0.3, 0.7])
    m2 = unpack_factor_model(pack_factor_model(mix))
    assert isinstance(m2, M.Mixture)
    np.testing.assert_allclose(np.asarray(m2.diversity), [0.3, 0.7],
                               atol=1e-6)
    assert isinstance(m2.mechanics, M.Prior)


def test_graph_roundtrip_solves(tmp_path):
    fg, steps = fourdoor_sequence()
    steps[0]()
    steps[1]()
    path = str(tmp_path / "fg.json")
    save_graph(fg, path)
    fg2 = load_graph(path)
    assert fg2.ls() == fg.ls()
    assert fg2.lsf() == fg.lsf()
    # beliefs survive
    np.testing.assert_allclose(np.asarray(fg2.points("x1")),
                               np.asarray(fg.points("x1")))
    # and the loaded graph still solves end-to-end
    solve_tree(fg2)
    p = np.asarray(fg2.points("x1")[:, 0])
    assert np.mean(np.abs(p + 100) < 20) + np.mean(np.abs(p - 0) < 20) > 0.7


def test_parch_drops_points(tmp_path):
    fg = generate_kaess(graphinit=True)
    path = str(tmp_path / "fg.json")
    save_graph(fg, path, parch=True)
    import json
    doc = json.load(open(path))
    assert all("points" not in b
               for v in doc["variables"] for b in v["beliefs"].values())
    fg2 = load_graph(path)       # loads with zero placeholders
    assert fg2.points("x1").shape[0] == fg.params.N


def test_tree_roundtrip(tmp_path):
    fg = generate_kaess()
    tree = build_tree(fg, order=["l1", "l2", "x1", "x2", "x3"])
    path = str(tmp_path / "bt.json")
    save_tree(tree, path)
    t2 = load_tree(path)
    assert t2.num_cliques() == tree.num_cliques()
    for cid, c in tree.cliques.items():
        c2 = t2.cliques[cid]
        assert c2.frontals == c.frontals
        assert c2.separator == c.separator
        assert c2.parent == c.parent
    assert t2.elimination_order == tree.elimination_order


def test_extension_model_roundtrip(tmp_path):
    import jax.numpy as jnp
    from incrementalinference.jl_tpu.models import (DERelative,
                                                    HeatmapGridDensity,
                                                    LevelSetGridNormal)
    from incrementalinference.jl_tpu.serialization import register_fn

    xs = jnp.linspace(0, 10, 8)
    ys = jnp.linspace(0, 10, 8)
    X, Y = jnp.meshgrid(xs, ys)
    h = HeatmapGridDensity(X + Y, (xs, ys))
    h2 = unpack_distribution(pack_distribution(h))
    np.testing.assert_allclose(np.asarray(h2.data), np.asarray(h.data))

    ls = LevelSetGridNormal(X + Y, (xs, ys), level=10.0, sigma=1.0)
    ls2 = unpack_distribution(pack_distribution(ls))
    np.testing.assert_allclose(np.asarray(ls2.heatmap.weights),
                               np.asarray(ls.heatmap.weights), atol=1e-6)

    def drift(t, x):
        return jnp.full_like(x, 2.0)

    register_fn("drift2", drift)
    de = DERelative(drift, 0.0, 3.0, dim=1)
    de2 = unpack_factor_model(pack_factor_model(de))
    assert de2.t1 == 3.0 and de2.f is drift


from incrementalinference.jl_tpu.serialization import (pack_distribution,  # noqa: E402,F811
                                                       unpack_distribution)


def test_custom_factor_model_roundtrip(tmp_path):
    """User-defined factor models round-trip through the generic registry
    path (reference packed-converter dispatch for user factors)."""
    import jax.numpy as jnp
    from incrementalinference.jl_tpu import (ManifoldPrior, MvNormal,
                                             VariableType, initfg)
    from incrementalinference.jl_tpu.canonical import _Pose2Point2Bearingless
    from incrementalinference.jl_tpu.graph import ContinuousEuclid
    from incrementalinference.jl_tpu.manifolds import SE2
    from incrementalinference.jl_tpu.serialization import (load_graph,
                                                           save_graph)

    se2 = SE2()
    fg = initfg()
    fg.add_variable("x", VariableType("Pose2", se2))
    fg.add_factor(["x"], ManifoldPrior(se2, jnp.zeros(3),
                                       MvNormal([0.0] * 3, [0.1] * 3)))
    fg.add_variable("l", ContinuousEuclid(2))
    fg.add_factor(["x", "l"], _Pose2Point2Bearingless(
        MvNormal([3.0, 1.0], [0.2, 0.2])))
    path = str(tmp_path / "custom.json")
    save_graph(fg, path)
    fg2 = load_graph(path)
    m = [f.model for f in fg2.factors.values()
         if type(f.model).__name__ == "_Pose2Point2Bearingless"][0]
    np.testing.assert_allclose(np.asarray(m.Z.mu), [3.0, 1.0], atol=1e-6)
    from incrementalinference.jl_tpu import solve_tree
    solve_tree(fg2)
    assert np.all(np.isfinite(np.asarray(fg2.points("l"))))


def test_metadata_roundtrip(tmp_path):
    """PPEs, solvedCount, timestamps and blob entries persist through
    save/load (reference saveDFG stores the full variable record)."""
    import incrementalinference.jl_tpu as ii
    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             initfg, solve_tree)

    fg = initfg(ii.SolverParams(N=40))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 0.5)))
    solve_tree(fg)
    ii.add_blob_store(fg, ii.InMemoryBlobStore())
    entry = ii.add_data(fg, "x0", "meta", b'{"sensor": "lidar"}',
                        mime_type="application/json/octet-stream")

    path = str(tmp_path / "fg_meta.json")
    save_graph(fg, path)
    fg2 = load_graph(path)

    assert fg2.var("x0").get_solved_count() == fg.var("x0").get_solved_count() > 0
    assert abs(fg2.var("x0").timestamp - fg.var("x0").timestamp) < 1e-6
    fl = fg.lsf()[0]
    assert abs(fg2.factor(fl).timestamp - fg.factor(fl).timestamp) < 1e-6
    np.testing.assert_allclose(
        np.asarray(fg2.var("x1").ppe["default"]["suggested"]),
        np.asarray(fg.var("x1").ppe["default"]["suggested"]), atol=1e-6)
    # blob ENTRY metadata rides along (blob payloads live in the store)
    e2 = fg2.var("x0").data["meta"]
    assert e2.blob_id == entry.blob_id and e2.hash == entry.hash


def test_mkd_manifold_type_roundtrip():
    """PackedManifoldKernelDensity keeps the manifold TYPE (reference
    SerializationMKD.jl packs the manifold string) — an SE2 measurement
    density must not come back Euclidean."""
    import jax
    import jax.numpy as jnp

    from incrementalinference.jl_tpu.distributions import \
        ManifoldKernelDensity
    from incrementalinference.jl_tpu.manifolds import SE2
    from incrementalinference.jl_tpu.serialization.packed import (
        pack_distribution, unpack_distribution)

    man = SE2()
    pts = jnp.tile(man.identity()[None], (8, 1)) + \
        0.01 * jax.random.normal(jax.random.PRNGKey(0), (8, man.point_dim))
    m = ManifoldKernelDensity(man, pts)
    m2 = unpack_distribution(pack_distribution(m))
    assert isinstance(m2.manifold, SE2)
    import numpy as np
    np.testing.assert_allclose(np.asarray(m2.belief.points),
                               np.asarray(m.belief.points), atol=1e-6)
    # pre-r2 files without the manifold field still load (Euclidean(dim))
    d = pack_distribution(m)
    del d["manifold"]
    m3 = unpack_distribution(d)
    assert m3.manifold.dof == man.dof


def test_save_graph_keeps_ppe_lazy(tmp_path):
    """Saving a solved graph must NOT force lazily-deferred PPEs (each
    force compiles + dispatches the PPE kernel — a measured 10 s cold
    stall when the precompile farm saved a graph mid-solve); unforced
    PPEs round-trip as a lazy marker and materialize on first read."""
    import incrementalinference.jl_tpu as ii
    from incrementalinference.jl_tpu import (ContinuousScalar,
                                             LinearRelative, Normal, Prior,
                                             initfg, solve_tree)
    from incrementalinference.jl_tpu.beliefs import LazyPPE

    fg = initfg(ii.SolverParams(N=40))
    fg.add_variable("x0", ContinuousScalar)
    fg.add_factor(["x0"], Prior(Normal(0.0, 0.5)))
    fg.add_variable("x1", ContinuousScalar)
    fg.add_factor(["x0", "x1"], LinearRelative(Normal(10.0, 0.5)))
    solve_tree(fg)
    est = fg.var("x1").ppe["default"]
    assert isinstance(est, LazyPPE) and not est._done

    path = str(tmp_path / "fg_lazy.json")
    save_graph(fg, path)
    assert not est._done                 # save did not force it

    fg2 = load_graph(path)
    est2 = fg2.var("x1").ppe["default"]
    assert isinstance(est2, LazyPPE) and not est2._done
    # materializes on read, near the solved mean
    val = float(np.asarray(est2["suggested"])[0])
    assert abs(val - 10.0) < 3.0, val


def test_warmstart_seed_cache(tmp_path):
    """The shipped compiled-program pack copies into a cache dir once and
    is idempotent (existing entries kept)."""
    from incrementalinference.jl_tpu.warmstart import seed_cache

    dest = str(tmp_path / "cache")
    n1 = seed_cache(dest=dest)
    assert n1 > 0
    n2 = seed_cache(dest=dest)
    assert n2 == 0
    assert seed_cache(dest=dest, backend="gpu") == 0   # no pack -> no-op
