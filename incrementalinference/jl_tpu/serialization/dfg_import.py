"""Import of reference-ecosystem saved graphs (VERDICT r3 missing #4).

The reference ecosystem persists factor graphs through DistributedFactor-
Graphs.jl ``saveDFG``: a tar.gz (or directory) of per-node JSON files —
``variables/<label>.json`` with the packed variable-node data and
``factors/<label>.json`` whose ``data``/``fnctype`` fields carry the
packed-factor structs this module decodes.  Schema sources in the
reference:

- packed distributions (PackedNormal/PackedFullNormal/…):
  src/Serialization/entities/SerializingDistributions.jl:22-66 and the
  pack/unpack pairs in services/SerializingDistributions.jl:4-38;
- packed manifold KDE: src/Serialization/entities/AdditionalDensities.jl:2-9;
- packed factors (PackedPrior{Z}, PackedLinearRelative{Z}, PackedMixture
  {N,F_,S,components,diversity}, PackedPartialPrior{varType,Z,partials},
  PackedEuclidDistance, PackedPriorCircular, PackedCircularCircular):
  src/Factors/*.jl serialization blocks;
- the factor-node payload (fnc, multihypo, certainhypo, nullhypo,
  inflation) and its reconstruction:
  src/Serialization/services/DispatchPackedConversions.jl:25-160.

Julia is 1-indexed: ``partials`` and ``certainhypo`` arrive 1-based and
are shifted here.  Unknown packed types raise with the offending _type so
a migrating user sees exactly what is unsupported.
"""

from __future__ import annotations

import json
import logging
import os
import shutil
import tarfile
import tempfile
from typing import Dict, List, Optional

import numpy as np

__all__ = ["load_dfg_archive"]


# ---------------------------------------------------------------------------
# packed distributions (reference SerializingDistributions.jl)
# ---------------------------------------------------------------------------

def _tname(d: Dict) -> str:
    t = d.get("_type") or d.get("PackedSamplableTypeJSON") or ""
    return t.rsplit(".", 1)[-1]


def _unpack_dfg_distribution(d: Dict):
    from ..distributions import (AliasingScalarSampler, Categorical,
                                 ManifoldKernelDensity, MvNormal, Normal,
                                 Rayleigh, Uniform)

    t = _tname(d)
    if t == "PackedNormal":
        return Normal(float(d["mu"]), float(d["sigma"]))
    if t == "PackedFullNormal":
        mu = np.asarray(d["mu"], np.float32)
        cov = np.asarray(d["cov"], np.float32).reshape(len(mu), len(mu))
        return MvNormal(mu, cov)
    if t == "PackedDiagNormal":
        mu = np.asarray(d["mu"], np.float32)
        # 'diag' stores VARIANCES (reference packs dtr.Σ.diag); our 1-D
        # MvNormal convenience takes std vectors
        return MvNormal(mu, np.sqrt(np.asarray(d["diag"], np.float32)))
    if t == "PackedZeroMeanDiagNormal":
        var = np.asarray(d["diag"], np.float32)
        return MvNormal(np.zeros(len(var), np.float32), np.sqrt(var))
    if t == "PackedZeroMeanFullNormal":
        cov = np.asarray(d["cov"], np.float32)
        n = int(round(np.sqrt(cov.size)))
        return MvNormal(np.zeros(n, np.float32), cov.reshape(n, n))
    if t == "PackedUniform":
        return Uniform(float(d["a"]), float(d["b"]))
    if t == "PackedCategorical":
        p = np.asarray(d["p"], np.float32)
        return Categorical(p / p.sum())
    if t == "PackedRayleigh":
        return Rayleigh(float(d["sigma"]))
    if t == "PackedAliasingScalarSampler":
        return AliasingScalarSampler(
            np.asarray(d["domain"], np.float32),
            np.asarray(d["weights"], np.float32))
    if t == "PackedManifoldKernelDensity":
        pts = np.asarray(d["pts"], np.float32)        # (N, dim) rows
        man = _manifold_for_vartype(d.get("varType", ""))
        bw = d.get("bw") or None
        return ManifoldKernelDensity(man, pts, bw=bw)
    raise ValueError(
        f"unsupported packed distribution type {d.get('_type')!r}")


# ---------------------------------------------------------------------------
# variable types (reference @defVariable names as stored by DFG)
# ---------------------------------------------------------------------------

def _vartype_for_name(name: str):
    from ..graph import Circular, ContinuousEuclid, VariableType

    short = name.rsplit(".", 1)[-1]
    if short in ("ContinuousScalar", "ContinuousEuclid{1}", "Position{1}",
                 "Position1"):
        return ContinuousEuclid(1)
    for pat in ("ContinuousEuclid{", "Position{"):
        if short.startswith(pat):
            n = int(short[len(pat):].rstrip("}"))
            return ContinuousEuclid(n)
    if short == "Circular":
        return Circular
    if short in ("Pose2", "SpecialEuclidean(2)"):
        from ..manifolds import SE2

        return VariableType("Pose2", SE2())
    if short in ("Pose3", "SpecialEuclidean(3)"):
        from ..manifolds import SE3

        return VariableType("Pose3", SE3())
    raise ValueError(f"unsupported variable type {name!r}")


def _manifold_for_vartype(name: str):
    return _vartype_for_name(name or "ContinuousScalar").manifold


# ---------------------------------------------------------------------------
# packed factors (reference src/Factors/*.jl serialization blocks)
# ---------------------------------------------------------------------------

def _unpack_dfg_factor_model(fnc: Dict, fnctype: str):
    from ..models.factors import (CircularCircular, EuclidDistance,
                                  LinearRelative, Mixture, PartialPrior,
                                  Prior, PriorCircular)

    t = (fnctype or fnc.get("_type", "")).rsplit(".", 1)[-1]
    if t == "PackedPrior":
        return Prior(_unpack_dfg_distribution(fnc["Z"]))
    if t == "PackedLinearRelative":
        return LinearRelative(_unpack_dfg_distribution(fnc["Z"]))
    if t == "PackedEuclidDistance":
        return EuclidDistance(_unpack_dfg_distribution(fnc["Z"]))
    if t == "PackedPriorCircular":
        return PriorCircular(_unpack_dfg_distribution(fnc["Z"]))
    if t == "PackedCircularCircular":
        return CircularCircular(_unpack_dfg_distribution(fnc["Z"]))
    if t == "PackedPartialPrior":
        partials = tuple(int(p) - 1 for p in fnc["partials"])   # 1-based
        return PartialPrior(_unpack_dfg_distribution(fnc["Z"]),
                            partial=partials)
    if t == "PackedMixture":
        mech_name = fnc["F_"].rsplit(".", 1)[-1].replace("Packed", "")
        mech = {"Prior": Prior, "LinearRelative": LinearRelative,
                "EuclidDistance": EuclidDistance}.get(mech_name)
        if mech is None:
            raise ValueError(
                f"unsupported Mixture mechanics {fnc['F_']!r}")
        comps = [_unpack_dfg_distribution(c) for c in fnc["components"]]
        div = fnc.get("diversity")
        weights = None
        if isinstance(div, dict) and _tname(div) == "PackedCategorical":
            weights = np.asarray(div["p"], np.float32)
        return Mixture(mech, comps, weights)
    raise ValueError(f"unsupported packed factor type {fnctype!r}")


# ---------------------------------------------------------------------------
# archive walking
# ---------------------------------------------------------------------------

def _iter_node_jsons(root: str, kind: str):
    """Yield parsed JSON dicts for every ``**/<kind>/*.json`` under root."""
    for dirpath, _dirnames, filenames in sorted(os.walk(root)):
        if os.path.basename(dirpath) != kind:
            continue
        for fn in sorted(filenames):
            if fn.endswith(".json"):
                with open(os.path.join(dirpath, fn)) as fp:
                    yield json.load(fp)


def _maybe_json(v):
    """DFG stores nested payloads either inline or as JSON strings."""
    if isinstance(v, str):
        return json.loads(v)
    return v


def load_dfg_archive(path: str, params=None, n_default: int = 100):
    """Load a reference-ecosystem saved graph (``saveDFG`` tar.gz or its
    unpacked directory) into a solvable :class:`FactorGraph`.

    Restores variable types, solver-data particle values/bandwidths when
    present (``vecval``/``vecbw``, point-major flattening), factor models
    via the packed-struct converters above, and multihypo/nullhypo
    metadata (reference reconstFactorData,
    DispatchPackedConversions.jl:25-160).  Per-factor ``inflation``
    overrides are NOT honored — inflation is a solver-level knob here
    (``SolverParams.inflation``); a factor carrying a non-default value
    logs one warning so the divergence is visible.  ``certainhypo`` is
    derivable from ``multihypo`` and is not stored separately.  Variables
    without stored points get default identity beliefs and auto-init at
    solve time."""
    from ..graph import FactorGraph
    from ..config import SolverParams

    if os.path.isfile(path):
        # extract, parse, and always clean up (repeated archive loads must
        # not accumulate under /tmp)
        tmp = tempfile.mkdtemp(prefix="iitpu_dfg_")
        try:
            with tarfile.open(path, "r:*") as tf:
                tf.extractall(tmp, filter="data")
            return _load_dfg_tree(tmp, params, n_default)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
    return _load_dfg_tree(path, params, n_default)


def _load_dfg_tree(root: str, params, n_default: int):
    from ..graph import FactorGraph
    from ..config import SolverParams

    fg = FactorGraph(params or SolverParams())

    for vd in _iter_node_jsons(root, "variables"):
        label = vd["label"]
        vt = _vartype_for_name(vd.get("variableType", "ContinuousScalar"))
        # drop the node-kind marker tags DFG adds implicitly (:VARIABLE /
        # :FACTOR): keeping them would break tag-equality round trips with
        # graphs built here (save_dfg_archive re-adds them on the way out)
        tags = tuple(t.lstrip(":") for t in vd.get("tags", [])
                     if t.lstrip(":") not in ("VARIABLE", "FACTOR"))
        solver = vd.get("solverDataDict") or {}
        if not solver and vd.get("solverData"):
            solver = {sd.get("solveKey", "default"): sd
                      for sd in map(_maybe_json, vd["solverData"])}
        sd = _maybe_json(solver.get("default")) if solver else None
        N = n_default
        if sd and sd.get("vecval"):
            dim = int(sd.get("dimval") or vt.manifold.point_dim)
            N = len(sd["vecval"]) // dim
        fg.add_variable(label, vt, N=N, tags=tags,
                        solvable=int(vd.get("solvable", 1)))
        if sd and sd.get("vecval"):
            pts = np.asarray(sd["vecval"], np.float32).reshape(N, dim)
            bw = None
            if sd.get("vecbw"):
                bw = np.asarray(sd["vecbw"], np.float32)[:vt.manifold.dof]
            fg.set_belief(label, pts, bw=bw,
                          initialized=bool(sd.get("initialized", True)))

    for fd in _iter_node_jsons(root, "factors"):
        label = fd["label"]
        order = [str(s).lstrip(":") for s in
                 (fd.get("_variableOrderSymbols")
                  or fd.get("variableOrderSymbols") or [])]
        data = _maybe_json(fd.get("data") or {})
        fnc = _maybe_json(data.get("fnc") or fd.get("fnc") or {})
        model = _unpack_dfg_factor_model(fnc, fd.get("fnctype", ""))
        multihypo = data.get("multihypo") or None
        if multihypo is not None and len(multihypo) == 0:
            multihypo = None
        nullhypo = float(data.get("nullhypo", 0.0))
        infl = data.get("inflation")
        if infl is not None and abs(float(infl)
                                    - fg.params.inflation) > 1e-9:
            logging.getLogger(__name__).warning(
                "factor %s carries inflation=%s; this build applies the "
                "solver-level SolverParams.inflation=%s instead "
                "(per-factor inflation is not honored)",
                label, infl, fg.params.inflation)
        tags = tuple(t.lstrip(":") for t in fd.get("tags", [])
                     if t.lstrip(":") not in ("VARIABLE", "FACTOR"))
        fg.add_factor(order, model, multihypo=multihypo,
                      nullhypo=nullhypo, label=label, tags=tags,
                      solvable=int(fd.get("solvable", 1)),
                      graphinit=False)
    return fg
