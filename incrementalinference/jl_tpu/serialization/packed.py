"""Packed (JSON-safe) serialization of distributions, beliefs, factors,
graphs, and trees.

Reference: src/Serialization/services/SerializingDistributions.jl:4-38
(packDistribution/unpackDistribution), SerializationMKD.jl:14-40
(PackedManifoldKernelDensity + parchDistribution),
DispatchPackedConversions.jl:25-160 (packed-factor reconstruction), and
saveTree/loadTree (JunctionTreeUtils.jl:1691-1768).  JSON rather than BSON;
arrays as nested lists.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .. import distributions as D
from .. import models as M
from ..beliefs import Belief, LazyPPE as _LazyPPE
from ..config import SolverParams
from ..graph import FactorGraph, Variable, VariableType
from ..manifolds import (SE2, SE3, SO2, SO3, Circle, Euclidean, Manifold,
                         Product, Sphere2)
from ..tree.bayestree import BayesTree, Clique, CliqStatus

__all__ = [
    "pack_distribution", "unpack_distribution", "pack_belief",
    "unpack_belief", "pack_manifold", "unpack_manifold", "pack_factor_model",
    "unpack_factor_model", "save_graph", "load_graph", "save_tree",
    "load_tree", "register_fn",
]


def _arr(x) -> list:
    return np.asarray(x).tolist()


# ---------------------------------------------------------------------------
# manifolds
# ---------------------------------------------------------------------------

def pack_manifold(m: Manifold) -> Any:
    """Symbolic manifold name for packed payloads."""
    if isinstance(m, Euclidean):
        return {"_type": "Euclidean", "n": m.n}
    if isinstance(m, SO2):
        return {"_type": "SO2"}
    if isinstance(m, Circle):
        return {"_type": "Circle"}
    if isinstance(m, SE2):
        return {"_type": "SE2"}
    if isinstance(m, SO3):
        return {"_type": "SO3"}
    if isinstance(m, SE3):
        return {"_type": "SE3"}
    if isinstance(m, Sphere2):
        return {"_type": "Sphere2"}
    if isinstance(m, Product):
        return {"_type": "Product",
                "components": [pack_manifold(c) for c in m.components]}
    raise TypeError(f"cannot pack manifold {m!r}")


def unpack_manifold(d: Dict) -> Manifold:
    t = d["_type"]
    if t == "Euclidean":
        return Euclidean(d["n"])
    if t == "Circle":
        return Circle()
    if t == "SO2":
        return SO2()
    if t == "SE2":
        return SE2()
    if t == "SO3":
        return SO3()
    if t == "SE3":
        return SE3()
    if t == "Sphere2":
        return Sphere2()
    if t == "Product":
        return Product(*[unpack_manifold(c) for c in d["components"]])
    raise TypeError(f"unknown packed manifold {t}")


# ---------------------------------------------------------------------------
# distributions (reference packDistribution forms)
# ---------------------------------------------------------------------------

def _pack_distribution_core(z):
    if isinstance(z, D.Normal):
        return {"_type": "Normal", "mu": float(z.mu), "sigma": float(z.sigma)}
    if isinstance(z, D.MvNormal):
        return {"_type": "MvNormal", "mu": _arr(z.mu), "cov": _arr(z.cov)}
    if isinstance(z, D.Uniform):
        return {"_type": "Uniform", "a": float(z.a), "b": float(z.b)}
    if isinstance(z, D.Rayleigh):
        return {"_type": "Rayleigh", "sigma": float(z.sigma)}
    if isinstance(z, D.Categorical):
        return {"_type": "Categorical", "p": _arr(z.p)}
    if isinstance(z, D.AliasingScalarSampler):
        return {"_type": "AliasingScalarSampler", "x": _arr(z.x),
                "weights": _arr(z.weights)}
    if isinstance(z, D.ManifoldKernelDensity):
        # PackedManifoldKernelDensity equivalent for measurement densities
        # (reference SerializationMKD.jl:14-40)
        return {"_type": "ManifoldKernelDensity", "dim": z.manifold.dof,
                "manifold": pack_manifold(z.manifold),
                "points": _arr(z.belief.points), "bw": _arr(z.belief.bw)}
    return None


def _unpack_distribution_core(d: Dict):
    t = d["_type"]
    if t == "Normal":
        return D.Normal(d["mu"], d["sigma"])
    if t == "MvNormal":
        return D.MvNormal(jnp.asarray(d["mu"]), jnp.asarray(d["cov"]))
    if t == "Uniform":
        return D.Uniform(d["a"], d["b"])
    if t == "Rayleigh":
        return D.Rayleigh(d["sigma"])
    if t == "Categorical":
        return D.Categorical(jnp.asarray(d["p"]))
    if t == "AliasingScalarSampler":
        return D.AliasingScalarSampler(jnp.asarray(d["x"]),
                                       jnp.asarray(d["weights"]))
    if t == "ManifoldKernelDensity":
        # "manifold" absent in pre-r2 files: fall back to Euclidean(dim)
        man = (unpack_manifold(d["manifold"]) if "manifold" in d
               else Euclidean(int(d["dim"])))
        return D.ManifoldKernelDensity(man, jnp.asarray(d["points"]),
                                       bw=jnp.asarray(d["bw"]))
    return None


# ---------------------------------------------------------------------------
# beliefs (PackedManifoldKernelDensity; parch = hollow out points)
# ---------------------------------------------------------------------------

def pack_belief(b: Belief, parch: bool = False) -> Dict:
    """JSON-safe packed KDE belief (reference PackedManifoldKernelDensity;
    ``parch=True`` hollows the point block — parchDistribution,
    src/Serialization/services/SerializationMKD.jl:14-40)."""
    out = {"_type": "Belief", "bw": _arr(b.bw), "ipc": _arr(b.ipc),
           "npts": int(b.points.shape[0])}
    if not parch:
        out["points"] = _arr(b.points)
    return out


def unpack_belief(d: Dict) -> Belief:
    """Rebuild a ``Belief`` from its packed dict (parched blocks
    resample from the packed bandwidth)."""
    pts = jnp.asarray(d.get("points",
                            np.zeros((d["npts"], len(d["bw"])))),
                      jnp.float32)
    return Belief(points=pts, bw=jnp.asarray(d["bw"], jnp.float32),
                  ipc=jnp.asarray(d["ipc"], jnp.float32))


# ---------------------------------------------------------------------------
# factor models
# ---------------------------------------------------------------------------

def _pack_factor_model_core(m):
    if isinstance(m, M.Mixture):
        return {"_type": "Mixture",
                "mechanics": pack_factor_model(m.mechanics),
                "components": [pack_distribution(c) for c in m.components],
                "diversity": _arr(m.diversity)}
    if isinstance(m, M.PartialPrior):
        return {"_type": "PartialPrior", "Z": pack_distribution(m.Z),
                "partial": list(m.partial)}
    if isinstance(m, M.MsgPrior):
        return {"_type": "MsgPrior", "belief": pack_belief(m.belief),
                "manifold": pack_manifold(m.manifold)}
    if isinstance(m, M.MetaPrior):
        return {"_type": "MetaPrior", "data": m.data}
    if isinstance(m, M.GenericMarginal):
        return {"_type": "GenericMarginal"}
    if isinstance(m, M.ManifoldPrior):
        return {"_type": "ManifoldPrior", "manifold": pack_manifold(m.manifold),
                "p0": _arr(m.p0), "Z": pack_distribution(m.Z)}
    if isinstance(m, M.ManifoldFactor):
        return {"_type": "ManifoldFactor",
                "manifold": pack_manifold(m.manifold),
                "Z": pack_distribution(m.Z)}
    for cls in (M.Prior, M.LinearRelative, M.EuclidDistance, M.PriorCircular,
                M.CircularCircular):
        if type(m) is cls:
            return {"_type": cls.__name__, "Z": pack_distribution(m.Z)}
    return None


def _unpack_factor_model_core(d: Dict):
    t = d["_type"]
    simple = {"Prior": M.Prior, "LinearRelative": M.LinearRelative,
              "EuclidDistance": M.EuclidDistance,
              "PriorCircular": M.PriorCircular,
              "CircularCircular": M.CircularCircular}
    if t in simple:
        return simple[t](unpack_distribution(d["Z"]))
    if t == "Mixture":
        return M.Mixture(unpack_factor_model(d["mechanics"]),
                         [unpack_distribution(c) for c in d["components"]],
                         d["diversity"])
    if t == "PartialPrior":
        return M.PartialPrior(unpack_distribution(d["Z"]), d["partial"])
    if t == "MsgPrior":
        return M.MsgPrior(unpack_belief(d["belief"]),
                          unpack_manifold(d["manifold"]))
    if t == "MetaPrior":
        return M.MetaPrior(d.get("data"))
    if t == "GenericMarginal":
        return M.GenericMarginal()
    if t == "ManifoldPrior":
        return M.ManifoldPrior(unpack_manifold(d["manifold"]),
                               jnp.asarray(d["p0"]),
                               unpack_distribution(d["Z"]))
    if t == "ManifoldFactor":
        return M.ManifoldFactor(unpack_manifold(d["manifold"]),
                                unpack_distribution(d["Z"]))
    return None


# ---------------------------------------------------------------------------
# graph save/load (reference saveDFG/loadDFG role)
# ---------------------------------------------------------------------------

def save_graph(fg: FactorGraph, path: str, parch: bool = False) -> str:
    """Save the graph as packed JSON (reference saveDFG; packed factor
    forms per DispatchPackedConversions.jl).  ``parch=True`` hollows out
    belief point blocks (reference parchDistribution,
    src/Serialization/services/SerializationMKD.jl)."""
    doc = {"_format": "iitpu-fg-v1",
           "params": fg.params.__dict__ | {
               "algorithms": list(fg.params.algorithms)},
           "variables": [], "factors": []}
    for lbl, v in fg.variables.items():
        doc["variables"].append({
            "label": lbl, "vartype": v.vartype.name,
            "manifold": pack_manifold(v.manifold), "N": v.N,
            "tags": sorted(v.tags), "solvable": v.solvable,
            "marginalized": v.marginalized,
            "beliefs": {k: pack_belief(b, parch=parch)
                        for k, b in v.beliefs.items()},
            "initialized": dict(v.initialized),
            "parametric_point": (None if v.parametric_point is None
                                 else _arr(v.parametric_point)),
            "parametric_cov": (None if v.parametric_cov is None
                               else _arr(v.parametric_cov)),
            # reference saveDFG persists PPEs, solvedCount, timestamps and
            # blob entries alongside the solver data
            "timestamp": v.timestamp,
            "solved_count": dict(v.solved_count),
            # PPEs: lazily-deferred ones that were never read save as a
            # lazy marker and reconstruct as LazyPPE on load — forcing
            # them here would compile + dispatch the PPE kernel per
            # variable (a 10 s cold stall observed when the precompile
            # farm saved a graph mid-solve)
            "ppe": {k: ({"__lazy__": True}
                        if isinstance(est, _LazyPPE) and not est._done
                        else {kk: _arr(vv) for kk, vv in est.items()})
                    for k, est in v.ppe.items()},
            "data": {k: {"label": e.label, "blob_id": e.blob_id,
                         "blobstore": e.blobstore,
                         "mime_type": e.mime_type, "hash": e.hash,
                         "origin": e.origin,
                         "description": e.description,
                         "timestamp": e.timestamp}
                     for k, e in v.data.items()},
        })
    for lbl, f in fg.factors.items():
        doc["factors"].append({
            "label": lbl, "variables": list(f.variables),
            "model": pack_factor_model(f.model),
            "multihypo": (None if f.multihypo is None else list(f.multihypo)),
            "nullhypo": f.nullhypo, "tags": sorted(f.tags),
            "solvable": f.solvable, "timestamp": f.timestamp,
        })
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fp:
        json.dump(doc, fp)
    return path


def load_graph(path: str) -> FactorGraph:
    """Rebuild a solvable graph from ``save_graph`` output (reference
    loadDFG + reconstFactorData,
    src/Serialization/services/DispatchPackedConversions.jl:25-160).  For
    archives saved by the reference ecosystem itself use
    ``load_dfg_archive``."""
    with open(path) as fp:
        doc = json.load(fp)
    assert doc.get("_format") == "iitpu-fg-v1", "unknown graph format"
    pd = dict(doc["params"])
    pd["algorithms"] = tuple(pd.get("algorithms", ("default", "parametric")))
    params = SolverParams(**pd)
    fg = FactorGraph(params)
    for vd in doc["variables"]:
        vt = VariableType(vd["vartype"], unpack_manifold(vd["manifold"]))
        v = fg.add_variable(vd["label"], vt, N=vd["N"], tags=vd["tags"],
                            solvable=vd["solvable"])
        v.marginalized = vd["marginalized"]
        v.initialized = dict(vd["initialized"])
        v.beliefs = {k: unpack_belief(b) for k, b in vd["beliefs"].items()}
        if vd["parametric_point"] is not None:
            v.parametric_point = jnp.asarray(vd["parametric_point"])
        if vd["parametric_cov"] is not None:
            v.parametric_cov = jnp.asarray(vd["parametric_cov"])
        v.timestamp = vd.get("timestamp", 0.0)
        v.solved_count = dict(vd.get("solved_count", {}))
        v.ppe = {}
        for k, est in vd.get("ppe", {}).items():
            if est.get("__lazy__") and k in v.beliefs:
                v.ppe[k] = _LazyPPE(v.manifold, v.beliefs[k])
            elif not est.get("__lazy__"):
                v.ppe[k] = {kk: jnp.asarray(vv) for kk, vv in est.items()}
        if vd.get("data"):
            from ..datastore import BlobEntry
            v.data = {k: BlobEntry(**e) for k, e in vd["data"].items()}
    for fd in doc["factors"]:
        f = fg.add_factor(fd["variables"], unpack_factor_model(fd["model"]),
                          multihypo=fd["multihypo"], nullhypo=fd["nullhypo"],
                          label=fd["label"], graphinit=False,
                          tags=fd["tags"], solvable=fd["solvable"])
        f.timestamp = fd.get("timestamp", 0.0)
    return fg


# ---------------------------------------------------------------------------
# tree save/load (reference saveTree/loadTree)
# ---------------------------------------------------------------------------

def save_tree(tree: BayesTree, path: str) -> str:
    doc = {"_format": "iitpu-bt-v1",
           "elimination_order": tree.elimination_order,
           "build_time": tree.build_time,
           "cliques": [{
               "cid": c.cid, "frontals": c.frontals,
               "separator": c.separator, "parent": c.parent,
               "children": c.children, "potentials": c.potentials,
               "status": c.status.value, "is_recycled": c.is_recycled,
               "is_marginalized": c.is_marginalized,
               "direct_vars": c.direct_vars, "iter_vars": c.iter_vars,
               "msgskip_vars": c.msgskip_vars,
           } for c in tree.cliques.values()]}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as fp:
        json.dump(doc, fp)
    return path


def load_tree(path: str) -> BayesTree:
    """Rebuild a Bayes tree from ``save_tree`` output (reference loadTree,
    src/services/JunctionTreeUtils.jl:1691-1768)."""
    with open(path) as fp:
        doc = json.load(fp)
    assert doc.get("_format") == "iitpu-bt-v1", "unknown tree format"
    tree = BayesTree()
    tree.elimination_order = doc["elimination_order"]
    tree.build_time = doc["build_time"]
    for cd in doc["cliques"]:
        c = Clique(cid=cd["cid"], frontals=cd["frontals"],
                   separator=cd["separator"], parent=cd["parent"],
                   children=cd["children"], potentials=cd["potentials"],
                   status=CliqStatus(cd["status"]),
                   is_recycled=cd["is_recycled"],
                   is_marginalized=cd["is_marginalized"],
                   direct_vars=cd["direct_vars"],
                   iter_vars=cd["iter_vars"],
                   msgskip_vars=cd["msgskip_vars"])
        tree.cliques[c.cid] = c
        for frt in c.frontals:
            tree.frontal_to_clique[frt] = c.cid
    return tree


# ---------------------------------------------------------------------------
# optional densities / extension models (reference
# SerializingOptionalDensities.jl, ext/FluxModelsSerialization.jl)
# ---------------------------------------------------------------------------

# user-callable registry: ODE dynamics / NN apply fns serialize by name
_FN_REGISTRY: Dict[str, Any] = {}


def register_fn(name: str, fn) -> None:
    """Register a callable so factors holding it can round-trip
    (the reference reconstructs these from Julia type names;
    DispatchPackedConversions.jl:25-160)."""
    _FN_REGISTRY[name] = fn


def _fn_name(fn) -> str:
    for k, v in _FN_REGISTRY.items():
        if v is fn:
            return k
    name = getattr(fn, "__name__", None)
    if name and name != "<lambda>":
        _FN_REGISTRY[name] = fn
        return name
    raise TypeError(
        "cannot serialize an unregistered lambda; use register_fn()")


def _pack_ext(z):
    from ..models.densities import HeatmapGridDensity, LevelSetGridNormal
    from ..models.flux import FluxModelsDistribution, mlp_apply

    if isinstance(z, LevelSetGridNormal):
        return {"_type": "LevelSetGridNormal",
                "data": _arr(z.data),
                "xs": _arr(z.heatmap.xs), "ys": _arr(z.heatmap.ys),
                "level": z.level, "sigma": z.sigma}
    if isinstance(z, HeatmapGridDensity):
        return {"_type": "HeatmapGridDensity", "data": _arr(z.data),
                "xs": _arr(z.xs), "ys": _arr(z.ys)}
    if isinstance(z, FluxModelsDistribution):
        from ..models.flux import SequentialNet
        out = {"_type": "FluxModelsDistribution",
               "params": [[_arr(W), _arr(b)] for W, b in z.params],
               "data": _arr(z.data), "out_dim": z.out_dim,
               "shuffle": z.shuffle}
        if isinstance(z.apply_fn, SequentialNet):
            # arbitrary sequential architectures round-trip by structure,
            # no registry (reference ext/FluxModelsSerialization.jl)
            out["apply"] = "sequential"
            out["spec"] = [list(l) for l in z.apply_fn.spec]
        else:
            out["apply"] = ("mlp" if z.apply_fn is mlp_apply
                            else _fn_name(z.apply_fn))
        return out
    return None


def _unpack_ext(d: Dict):
    from ..models.densities import HeatmapGridDensity, LevelSetGridNormal
    from ..models.flux import FluxModelsDistribution, mlp_apply

    t = d["_type"]
    if t == "HeatmapGridDensity":
        return HeatmapGridDensity(jnp.asarray(d["data"]),
                                  (jnp.asarray(d["xs"]), jnp.asarray(d["ys"])))
    if t == "LevelSetGridNormal":
        # reconstruct from raw elevation data
        return LevelSetGridNormal(jnp.asarray(d["data"]),
                                  (jnp.asarray(d["xs"]), jnp.asarray(d["ys"])),
                                  d["level"], d["sigma"])
    if t == "FluxModelsDistribution":
        if d["apply"] == "sequential":
            from ..models.flux import SequentialNet
            fn = SequentialNet(d["spec"])
        elif d["apply"] == "mlp":
            fn = mlp_apply
        else:
            fn = _FN_REGISTRY[d["apply"]]
        params = [(jnp.asarray(W), jnp.asarray(b)) for W, b in d["params"]]
        return FluxModelsDistribution(fn, params, jnp.asarray(d["data"]),
                                      d["out_dim"], d["shuffle"])
    return None


def _pack_model_ext(m):
    from ..models.densities import PartialPriorPassThrough
    from ..models.ode import DERelative

    if isinstance(m, PartialPriorPassThrough):
        return {"_type": "PartialPriorPassThrough",
                "Z": pack_distribution(m.Z), "partial": list(m.partial)}
    if isinstance(m, DERelative):
        out = {"_type": "DERelative", "f": _fn_name(m.f), "t0": m.t0,
               "t1": m.t1, "Z": pack_distribution(m.Z), "steps": m.steps}
        if m.data is not None:
            if not isinstance(m.data, jnp.ndarray):
                raise TypeError(
                    "DERelative serialization supports data=None or a "
                    "single array (close over richer pytrees inside a "
                    "register_fn()-registered dynamics function instead)")
            out["data"] = _arr(m.data)
        return out
    return None


def _unpack_model_ext(d: Dict):
    from ..models.densities import PartialPriorPassThrough
    from ..models.ode import DERelative

    t = d["_type"]
    if t == "PartialPriorPassThrough":
        return PartialPriorPassThrough(unpack_distribution(d["Z"]),
                                       d["partial"])
    if t == "DERelative":
        return DERelative(_FN_REGISTRY[d["f"]], d["t0"], d["t1"],
                          unpack_distribution(d["Z"]), steps=d["steps"],
                          data=(jnp.asarray(d["data"])
                                if "data" in d else None))
    return None


# ---------------------------------------------------------------------------
# generic custom-model serialization via the model registry
# ---------------------------------------------------------------------------

def _pack_value(v):
    if v is None:
        return {"_k": "none"}
    if isinstance(v, (bool, int, float, str)):
        return {"_k": "scalar", "v": v}
    from ..beliefs import Belief as _Belief
    from ..manifolds import Manifold as _Manifold
    if isinstance(v, _Belief):
        return {"_k": "belief", "v": pack_belief(v)}
    if isinstance(v, _Manifold):
        return {"_k": "manifold", "v": pack_manifold(v)}
    if isinstance(v, D.Distribution):
        return {"_k": "dist", "v": pack_distribution(v)}
    if isinstance(v, (tuple, list)):
        return {"_k": "seq", "tuple": isinstance(v, tuple),
                "v": [_pack_value(x) for x in v]}
    try:
        return {"_k": "array", "v": _arr(v)}
    except Exception as e:                                  # noqa: BLE001
        raise TypeError(f"cannot pack custom field value {v!r}") from e


def _unpack_value(d):
    k = d["_k"]
    if k == "none":
        return None
    if k == "scalar":
        return d["v"]
    if k == "belief":
        return unpack_belief(d["v"])
    if k == "manifold":
        return unpack_manifold(d["v"])
    if k == "dist":
        return unpack_distribution(d["v"])
    if k == "seq":
        out = [_unpack_value(x) for x in d["v"]]
        return tuple(out) if d["tuple"] else out
    if k == "array":
        return jnp.asarray(d["v"], jnp.float32)
    raise TypeError(f"unknown packed value kind {k}")


def _pack_model_custom(m):
    from ..models.factors import MODEL_REGISTRY
    name = type(m).__name__
    if name not in MODEL_REGISTRY:
        return None
    _, children, aux = MODEL_REGISTRY[name]
    return {"_type": f"Custom:{name}",
            "children": {f: _pack_value(getattr(m, f))
                         for f in children},
            "aux": {f: _pack_value(getattr(m, f)) for f in aux}}


def _unpack_model_custom(d: Dict):
    t = d["_type"]
    if not t.startswith("Custom:"):
        return None
    from ..models.factors import MODEL_REGISTRY
    name = t.split(":", 1)[1]
    if name not in MODEL_REGISTRY:
        raise TypeError(
            f"custom factor model {name!r} is not registered in this "
            f"process — import its module before load_graph")
    cls, children, aux = MODEL_REGISTRY[name]
    m = object.__new__(cls)
    for f, v in d["children"].items():
        object.__setattr__(m, f, _unpack_value(v))
    for f, v in d["aux"].items():
        object.__setattr__(m, f, _unpack_value(v))
    return m


# ---------------------------------------------------------------------------
# dispatch registries (single definition point — replaces the former
# _orig_/_prev_ function-shadowing chains; extension points append here)
# ---------------------------------------------------------------------------

# ordered handler lists: each handler returns a packed dict / an instance,
# or None to pass to the next handler
_DIST_PACKERS = [_pack_ext, _pack_distribution_core]
_DIST_UNPACKERS = [_unpack_ext, _unpack_distribution_core]
_MODEL_PACKERS = [_pack_model_ext, _pack_factor_model_core,
                  _pack_model_custom]
_MODEL_UNPACKERS = [_unpack_model_ext, _unpack_factor_model_core,
                    _unpack_model_custom]


def pack_distribution(z) -> Dict:
    """Packed struct for any samplable distribution (reference
    packDistribution, src/Serialization/services/
    SerializingDistributions.jl:4-38)."""
    for h in _DIST_PACKERS:
        out = h(z)
        if out is not None:
            return out
    raise TypeError(f"cannot pack distribution {type(z).__name__}")


def unpack_distribution(d: Dict):
    """Inverse of ``pack_distribution`` (reference unpackDistribution)."""
    for h in _DIST_UNPACKERS:
        out = h(d)
        if out is not None:
            return out
    raise TypeError(f"unknown packed distribution {d['_type']}")


def pack_factor_model(m) -> Dict:
    """Packed factor data via the type-dispatch registry (reference
    Packed* factor structs + packFactorType)."""
    for h in _MODEL_PACKERS:
        out = h(m)
        if out is not None:
            return out
    raise TypeError(f"cannot pack factor model {type(m).__name__}")


def unpack_factor_model(d: Dict):
    """Inverse of ``pack_factor_model`` (reference reconstFactorData
    dispatch)."""
    for h in _MODEL_UNPACKERS:
        out = h(d)
        if out is not None:
            return out
    raise TypeError(f"unknown packed factor model {d['_type']}")
