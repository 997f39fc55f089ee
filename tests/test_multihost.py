"""Multi-host distribution tests (reference: test/testMultiprocess.jl —
``addprocs(2)`` + multiproc ``solveTree!``; SURVEY.md §2.9.2 subtree
partition across hosts).

The partition logic is pure host code and unit-tested in-process; the real
cross-process path spawns 2 localhost CPU processes (each with 2 virtual
devices) that jointly solve fixtures through
``jax.distributed`` + gloo collectives, and asserts posterior parity with a
single-process solve of the same graph."""

import numpy as np
import pytest

from incrementalinference.jl_tpu.parallel.multihost import (
    build_fixture, fixture_truth, launch_multihost, partition_tree,
    solve_tree_multihost)
from incrementalinference.jl_tpu.graphinit import ensure_solvable, init_all
from incrementalinference.jl_tpu.tree.bayestree import build_tree_reset


def _tree_for(name, scale):
    fg = build_fixture(name, scale)
    ensure_solvable(fg)
    init_all(fg)
    return fg, build_tree_reset(fg)


class TestPartition:
    def test_partition_covers_tree_once(self):
        fg, tree = _tree_for("anchored_forest", 6)
        part = partition_tree(tree, 3)
        owned = [c for p in part.part_cliques for c in p]
        assert sorted(owned + part.top) == sorted(tree.cliques)
        assert len(set(owned)) == len(owned)

    def test_parts_are_connected_subtrees(self):
        fg, tree = _tree_for("anchored_forest", 6)
        part = partition_tree(tree, 3)
        for p, cids in enumerate(part.part_cliques):
            cidset = set(cids)
            # every non-cut-root member's parent is in the same part
            roots = [c for c in cids
                     if tree.clique(c).parent not in cidset]
            for c in cids:
                if c not in roots:
                    assert tree.clique(c).parent in cidset

    def test_cut_roots_have_top_parents(self):
        fg, tree = _tree_for("anchored_forest", 6)
        part = partition_tree(tree, 3)
        top = set(part.top)
        for c in part.cut_roots:
            assert tree.clique(c).parent in top

    def test_forest_partition_has_no_top(self):
        fg, tree = _tree_for("forest", 8)
        part = partition_tree(tree, 4)
        assert part.top == []
        assert part.cut_roots == []          # no cut parent => no exchange

    def test_partition_deterministic(self):
        fg, tree = _tree_for("chain", 12)
        a = partition_tree(tree, 3)
        b = partition_tree(tree, 3)
        assert a.owner == b.owner and a.top == b.top

    def test_single_part_owns_everything(self):
        fg, tree = _tree_for("chain", 8)
        part = partition_tree(tree, 1)
        assert part.top == [] and len(part.part_cliques[0]) == \
            tree.num_cliques()

    def test_balance(self):
        fg, tree = _tree_for("forest", 8)
        part = partition_tree(tree, 4)
        sizes = [len(p) for p in part.part_cliques]
        assert max(sizes) - min(sizes) <= max(2, max(sizes) // 2)


class TestSingleProcessDegenerate:
    """process_count()==1: the partition-aware solve must still produce
    reference-quality posteriors with zero collectives (this is the 1-host
    baseline of the scaling-efficiency metric)."""

    @pytest.mark.parametrize("name,scale", [("anchored_forest", 4),
                                            ("chain", 8)])
    def test_posterior_quality(self, name, scale):
        fg = build_fixture(name, scale)
        tm = {}
        solve_tree_multihost(fg, timings=tm)
        truth = fixture_truth(name, scale)
        for v, mu in truth.items():
            pts = np.asarray(fg.points(v))[:, 0]
            # reference-style statistical window (testMultithreaded.jl:33-38
            # idiom): mean within a few sigma of truth at N=64
            assert abs(float(pts.mean()) - mu) < 1.0, (v, float(pts.mean()))
        assert tm["exchange_up_s"] == 0.0 or tm["exchange_up_s"] < 0.5


class TestMessageCodec:
    def test_flat_pack_unpack_roundtrip_se2(self):
        """The cut-edge message codec must carry manifold beliefs whose
        point_dim differs from dof (SE2: 3 ambient coords) bit-exactly
        through the flat buffer."""
        import jax.numpy as jnp

        from incrementalinference.jl_tpu import (ManifoldFactor,
                                                 ManifoldPrior, MvNormal,
                                                 VariableType, initfg)
        from incrementalinference.jl_tpu.manifolds import SE2
        from incrementalinference.jl_tpu.parallel.messages import (
            LikelihoodMessage)
        from incrementalinference.jl_tpu.parallel.multihost import (
            _msg_flat_layout, _pack_msgs, _unpack_msgs)
        from incrementalinference.jl_tpu.tree.bayestree import CliqStatus

        se2 = SE2()
        pose2 = VariableType("Pose2", se2)
        fg = initfg()
        fg.add_variable("p0", pose2)
        fg.add_factor(["p0"], ManifoldPrior(
            se2, jnp.zeros(3), MvNormal([0.0] * 3, [0.1] * 3)))
        fg.add_variable("p1", pose2)
        fg.add_factor(["p0", "p1"], ManifoldFactor(
            se2, MvNormal([1.0, 0.0, 0.2], [0.1] * 3)))

        msg = LikelihoodMessage(sender=7, status=CliqStatus.UPSOLVED,
                                has_priors=True)
        msg.beliefs["p0"] = fg.get_belief("p0")
        layout = [(7, ["p0"])]
        flat = _msg_flat_layout(fg, layout)
        buf = _pack_msgs(fg, layout, flat, {7: msg})

        class FakeTree:
            pass

        out = _unpack_msgs(fg, FakeTree(), layout, flat, buf[None, :],
                           {7: 0})
        m2 = out[7]
        assert m2.status == CliqStatus.UPSOLVED and m2.has_priors
        np.testing.assert_array_equal(np.asarray(m2.beliefs["p0"].points),
                                      np.asarray(msg.beliefs["p0"].points))
        np.testing.assert_array_equal(np.asarray(m2.beliefs["p0"].bw),
                                      np.asarray(msg.beliefs["p0"].bw))


class TestCrossProcess:
    """Spawn 2 localhost processes × 2 virtual CPU devices; gloo
    collectives carry the cut-edge and posterior payloads."""

    def test_two_process_anchored_forest_parity(self):
        reps = launch_multihost(2, "anchored_forest", scale=6,
                                devices_per_proc=2, timeout=900)
        assert len(reps) == 2
        truth = fixture_truth("anchored_forest", 6)
        # single-process comparison solve (same fixture, this process)
        fg = build_fixture("anchored_forest", 6)
        solve_tree_multihost(fg)
        single_errs = [abs(float(np.asarray(fg.points(v))[:, 0].mean()) - mu)
                       for v, mu in truth.items()]
        bar = max(1.0, 3.0 * max(single_errs))
        for r in reps:
            assert r["devices"] == 4          # 2 procs x 2 devices, global
            for phase in ("cold", "warm"):
                assert r[phase]["max_err"] < bar, (r["pid"], phase,
                                                   r[phase]["max_err"])
        # every process ends with the same full posterior (sync phase)
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6

    def test_parametric_multihost_matches_tree_solver(self):
        """Single-process parametric multihost must reproduce the standard
        clique-wise parametric tree solve BIT-EXACTLY (same partition-
        agnostic math, deterministic LM)."""
        import numpy as np

        from incrementalinference.jl_tpu import solve_tree
        from incrementalinference.jl_tpu.parallel.multihost import (
            solve_tree_parametric_multihost)

        fg_a = build_fixture("anchored_forest", 4)
        solve_tree(fg_a, algorithm="parametric")
        fg_b = build_fixture("anchored_forest", 4)
        solve_tree_parametric_multihost(fg_b)
        for v in fg_a.ls():
            np.testing.assert_array_equal(
                np.asarray(fg_a.var(v).parametric_point),
                np.asarray(fg_b.var(v).parametric_point))

    def test_two_process_parametric(self):
        """2-process parametric multihost: Gaussian cut messages + point/
        cov broadcast; every process ends with the same solution, near
        truth."""
        reps = launch_multihost(2, "anchored_forest", scale=6,
                                devices_per_proc=1, timeout=900,
                                algorithm="parametric")
        for r in reps:
            # clique-wise Gaussian BP fidelity bar (the single-process
            # tree solver lands at 0.166 on this fixture)
            assert r["warm"]["max_err"] < 0.35, r["warm"]["max_err"]
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6

    def test_two_process_incremental_recycling(self):
        """Grow the warm graph and re-solve with old_tree= across 2
        processes: recycling must engage (is_recycled cliques > 0) and the
        grown posterior stay accurate on every process."""
        reps = launch_multihost(2, "anchored_forest", scale=6,
                                devices_per_proc=1, timeout=900, grow=2)
        for r in reps:
            assert "incr" in r
            assert r["incr"]["n_recycled"] >= 3, r["incr"]
            assert r["incr"]["max_err"] < 1.5, r["incr"]["max_err"]
        assert abs(reps[0]["incr"]["max_err"]
                   - reps[1]["incr"]["max_err"]) < 1e-6

    def test_two_process_chain_exchange(self):
        """Chain: cut edges sit on the critical path, so the exchange is
        load-bearing — a dropped cut message would leave the top half
        anchored only by graphinit and blow the error bar."""
        reps = launch_multihost(2, "chain", scale=10, devices_per_proc=1,
                                timeout=900)
        for r in reps:
            assert r["warm"]["max_err"] < 1.2, r["warm"]["max_err"]


class TestFaultFlooding:
    """A clique failure in one process must abort ALL processes promptly
    (the cross-host bruteForcePushErrorCSM analogue): the failing process
    keeps participating in every collective, floods ERROR_STATUS through
    its cut messages / sync flag, and every process raises."""

    def test_two_process_error_floods(self):
        # fail the first cut-root clique owned by process 0 (cid from the
        # deterministic partition of the anchored forest)
        from incrementalinference.jl_tpu.graphinit import (ensure_solvable,
                                                           init_all)
        fg = build_fixture("anchored_forest", 6)
        ensure_solvable(fg)
        init_all(fg)
        from incrementalinference.jl_tpu.tree.bayestree import \
            build_tree_reset
        tree = build_tree_reset(fg)
        part = partition_tree(tree, 2)
        victim = next(c for c in part.cut_roots if part.owner[c] == 0)

        import time
        t0 = time.time()
        reps = launch_multihost(2, "anchored_forest", scale=6,
                                devices_per_proc=1, timeout=300,
                                fail_clique=victim)
        wall = time.time() - t0
        outcomes = {r["pid"]: r["fault"] for r in reps}
        assert outcomes[0]["outcome"] == "error"
        assert "injected" in outcomes[0]["message"] \
            or "failed on this process" in outcomes[0]["message"]
        assert outcomes[1]["outcome"] == "error"      # flooded, not hung
        assert wall < 200, wall                       # no collective hang

    def test_single_process_fault_hook(self):
        from incrementalinference.jl_tpu.parallel.multihost import \
            solve_tree_multihost
        fg = build_fixture("chain", 6)
        with pytest.raises(RuntimeError):
            solve_tree_multihost(fg, fail_cliques={1})


class TestSE2Distributed:
    def test_two_process_se2_chain(self):
        """SE(2) pose chain across 2 processes: manifold beliefs through
        the cut-edge codec, replicated top, and posterior broadcast."""
        reps = launch_multihost(2, "se2_chain", scale=8,
                                devices_per_proc=1, timeout=900)
        for r in reps:
            # position error bar matched to the single-host SE2 chain
            # test tolerance (test_manifold_solves.test_se2_pose_chain)
            assert r["warm"]["max_err"] < 0.8, r["warm"]["max_err"]
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6
