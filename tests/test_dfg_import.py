"""Reference wire-format graph import (VERDICT r3 missing #4): a
hand-authored golden archive matching the reference ecosystem's saveDFG
packed-JSON structs (DispatchPackedConversions.jl:25-160,
SerializingDistributions.jl:4-38, Factors/*.jl serialization blocks)
loads into a solvable graph whose solve passes the usual bars."""

import os
import tarfile

import numpy as np
import pytest

from incrementalinference.jl_tpu import solve_tree
from incrementalinference.jl_tpu.serialization import load_dfg_archive

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "dfg_archive")


def test_load_directory_structure():
    fg = load_dfg_archive(FIXTURE)
    assert sorted(fg.ls()) == ["l1", "theta", "x0", "x1", "x2"]
    assert len(fg.lsf()) == 7
    # variable types restored
    assert fg.var("x0").manifold.dof == 1
    assert fg.var("l1").manifold.dof == 2
    assert fg.var("theta").vartype.name == "Circular"
    # tags survive with the Julia ':' prefix stripped
    assert "LANDMARK" in fg.var("l1").tags


def test_stored_solver_data_restored():
    """x1 ships vecval/vecbw in the archive — its particles and bandwidth
    must come back point-major, marked initialized."""
    fg = load_dfg_archive(FIXTURE)
    v = fg.var("x1")
    assert v.is_initialized()
    pts = np.asarray(fg.points("x1"))
    assert pts.shape == (16, 1)
    assert abs(pts.mean() - 50.0) < 5.0
    assert abs(float(np.asarray(v.beliefs["default"].bw)[0]) - 2.5) < 1e-6
    # variables without stored data start uninitialized
    assert not fg.var("x0").is_initialized()


def test_packed_factor_models_decoded():
    fg = load_dfg_archive(FIXTURE)
    assert type(fg.factor("x0f1").model).__name__ == "Mixture"
    assert len(fg.factor("x0f1").model.components) == 4
    assert type(fg.factor("x0x1f1").model).__name__ == "LinearRelative"
    # PackedFullNormal 1x1 -> MvNormal with cov 16
    mu, cov = fg.factor("x1x2f1").model.mean_cov()
    assert abs(float(np.asarray(cov).reshape(())) - 16.0) < 1e-5
    # PackedPartialPrior: Julia 1-based 'partials' become 0-based
    assert fg.factor("l1f2").model.partial == (0,)
    assert type(fg.factor("thetaf1").model).__name__ == "PriorCircular"


def test_archive_solves_to_reference_bars():
    """The fourdoor step-2 sub-story inside the archive: x0 collapses to
    {-100, 0} (the fourdoortest.jl bars), the landmark lands on its prior
    and the circular variable on its wrapped prior."""
    fg = load_dfg_archive(FIXTURE)
    solve_tree(fg)

    p0 = np.asarray(fg.points("x0")[:, 0])
    m = np.mean(np.abs(p0 + 100) < 20) + np.mean(np.abs(p0 - 0) < 20)
    assert m > 0.8, m
    assert np.mean(np.abs(p0 - 300) < 20) < 0.1

    l1 = np.asarray(fg.points("l1"))
    # dim 0 fuses the full prior (3.0, var .25) with the partial (3.5, .16)
    assert abs(l1[:, 0].mean() - 3.2) < 0.5
    assert abs(l1[:, 1].mean() + 2.0) < 0.5

    th = np.asarray(fg.points("theta")[:, 0])
    assert np.mean(np.abs(th - 3.0) < 0.5) > 0.9


def test_load_targz_roundtrip(tmp_path):
    """The same archive as a saveDFG-style tar.gz."""
    tgz = tmp_path / "graph.tar.gz"
    with tarfile.open(tgz, "w:gz") as tf:
        tf.add(FIXTURE, arcname="savedfg")
    fg = load_dfg_archive(str(tgz))
    assert sorted(fg.ls()) == ["l1", "theta", "x0", "x1", "x2"]
    assert len(fg.lsf()) == 7


def test_unknown_types_raise_actionably():
    with pytest.raises(ValueError, match="unsupported packed factor"):
        from incrementalinference.jl_tpu.serialization.dfg_import import (
            _unpack_dfg_factor_model)
        _unpack_dfg_factor_model({}, "RoME.PackedPose2Pose2")
    with pytest.raises(ValueError, match="unsupported packed distribution"):
        from incrementalinference.jl_tpu.serialization.dfg_import import (
            _unpack_dfg_distribution)
        _unpack_dfg_distribution({"_type": "Whatever.PackedWeird"})
