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
        point_dim differs from dof (SE2: 3 ambient coords) through the
        flat buffer to within the scaled-f16 wire precision (points ship
        as f16 to halve the collective bytes; bw/ipc stay f32)."""
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
        np.testing.assert_allclose(np.asarray(m2.beliefs["p0"].points),
                                   np.asarray(msg.beliefs["p0"].points),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(m2.beliefs["p0"].bw),
                                      np.asarray(msg.beliefs["p0"].bw))

    def test_flat_codec_partial_beliefs(self):
        """NO_INIT messages carry only the beliefs that exist (the
        distributed init dance); the codec's presence flags must keep a
        missing belief missing instead of fabricating zeros."""
        from incrementalinference.jl_tpu import (ContinuousScalar, Normal,
                                                 Prior, initfg)
        from incrementalinference.jl_tpu.parallel.messages import (
            LikelihoodMessage)
        from incrementalinference.jl_tpu.parallel.multihost import (
            _msg_flat_layout, _pack_msgs, _unpack_msgs)
        from incrementalinference.jl_tpu.tree.bayestree import CliqStatus

        fg = initfg()
        fg.add_variable("a", ContinuousScalar)
        fg.add_variable("b", ContinuousScalar)
        fg.add_factor(["a"], Prior(Normal(1.0, 0.5)))

        msg = LikelihoodMessage(sender=3, status=CliqStatus.NO_INIT)
        msg.beliefs["a"] = fg.get_belief("a")       # b intentionally absent
        layout = [(3, ["a", "b"])]
        flat = _msg_flat_layout(fg, layout)
        buf = _pack_msgs(fg, layout, flat, {3: msg})
        out = _unpack_msgs(fg, None, layout, flat, buf[None, :], {3: 0})
        assert out[3].status == CliqStatus.NO_INIT
        assert "a" in out[3].beliefs and "b" not in out[3].beliefs

    def test_flat_codec_joint_payload_roundtrip(self):
        """Joint up-message payloads (use_msg_likelihoods) cross the cut
        losslessly: deconv-derived relatives between separator pairs plus
        class-anchor priors survive pack/unpack bit-exactly
        (reference jointmsg, TreeMessageUtils.jl:279-412)."""
        import jax.numpy as jnp

        from incrementalinference.jl_tpu import (ContinuousScalar,
                                                 LinearRelative, Normal,
                                                 Prior, initfg)
        from incrementalinference.jl_tpu.beliefs import make_belief
        from incrementalinference.jl_tpu.manifolds import Euclidean
        from incrementalinference.jl_tpu.parallel.messages import (
            JointMsg, LikelihoodMessage)
        from incrementalinference.jl_tpu.parallel.multihost import (
            _msg_flat_layout, _pack_msgs, _unpack_msgs)
        from incrementalinference.jl_tpu.tree.bayestree import CliqStatus

        fg = initfg()
        for v in ("a", "b"):
            fg.add_variable(v, ContinuousScalar)
        fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
        fg.add_factor(["a", "b"], LinearRelative(Normal(1.0, 0.5)))

        msg = LikelihoodMessage(sender=5, status=CliqStatus.UPSOLVED,
                                has_priors=True)
        msg.beliefs["a"] = fg.get_belief("a")
        msg.beliefs["b"] = fg.get_belief("b")
        jm = JointMsg()
        diffs = jnp.linspace(-1.0, 1.0, fg.var("a").N)[:, None]
        jm.relatives.append(("a", "b", make_belief(Euclidean(1), diffs)))
        jm.priors["a"] = fg.get_belief("a")
        msg.jointmsg = jm

        layout = [(5, ["a", "b"])]
        flat = _msg_flat_layout(fg, layout, joint=True)
        buf = _pack_msgs(fg, layout, flat, {5: msg})
        out = _unpack_msgs(fg, None, layout, flat, buf[None, :], {5: 0})
        jm2 = out[5].jointmsg
        assert jm2 is not None
        assert len(jm2.relatives) == 1 and list(jm2.priors) == ["a"]
        va, vb, rb = jm2.relatives[0]
        assert (va, vb) == ("a", "b")
        np.testing.assert_allclose(np.asarray(rb.points),
                                   np.asarray(diffs), rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(jm2.priors["a"].points),
                                   np.asarray(jm.priors["a"].points),
                                   rtol=1e-3, atol=1e-3)

    def test_flat_codec_no_joint_when_disabled(self):
        """joint=False layouts must not waste buffer space on joint slots."""
        from incrementalinference.jl_tpu import (ContinuousScalar, Normal,
                                                 Prior, initfg)
        from incrementalinference.jl_tpu.parallel.multihost import (
            _msg_flat_layout)

        fg = initfg()
        fg.add_variable("a", ContinuousScalar)
        fg.add_factor(["a"], Prior(Normal(0.0, 1.0)))
        layout = [(1, ["a"])]
        plain = _msg_flat_layout(fg, layout)
        joint = _msg_flat_layout(fg, layout, joint=True)
        assert joint.size > plain.size


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


class TestDistributedTreeInit:
    """The tree-init fixed point spans processes (VERDICT r3 item 1): a
    graph whose initialization REQUIRES information to flow down through a
    cut edge and back up must solve identically to single-host — the old
    'solve single-host for this graph' carve-out is gone."""

    def test_single_process_chain_end_prior(self):
        fg = build_fixture("chain_end_prior", 8)
        assert not any(fg.var(v).is_initialized() for v in fg.ls())
        tm = {}
        solve_tree_multihost(fg, timings=tm)
        assert tm["init_passes"] >= 2            # the fixed point engaged
        truth = fixture_truth("chain_end_prior", 8)
        for v, mu in truth.items():
            assert abs(float(np.asarray(fg.points(v))[:, 0].mean())
                       - mu) < 1.0, v

    def test_two_process_cross_cut_down_init(self):
        """The only prior lives in the replicated top; the owned bottom
        subtrees emit NO_INIT up the cut and are initialized by the top's
        down messages, then re-up — 1-proc vs 2-proc posterior parity."""
        reps = launch_multihost(2, "chain_end_prior", scale=10,
                                devices_per_proc=1, timeout=900)
        fg = build_fixture("chain_end_prior", 10)
        solve_tree_multihost(fg)                 # 1-proc comparison
        truth = fixture_truth("chain_end_prior", 10)
        single = max(abs(float(np.asarray(fg.points(v))[:, 0].mean()) - mu)
                     for v, mu in truth.items())
        for r in reps:
            assert r["warm"]["timings"]["init_passes"] >= 2
            assert r["warm"]["max_err"] < max(1.0, 3.0 * single), r["warm"]
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6

    def test_two_process_noinit_forest_both_sides(self):
        """graphinit=False anchored forest: EVERY owned subtree on BOTH
        processes is prior-less and must down-init through its cut edge."""
        reps = launch_multihost(2, "anchored_forest_noinit", scale=6,
                                devices_per_proc=1, timeout=900)
        for r in reps:
            assert r["warm"]["timings"]["init_passes"] >= 2
            assert r["warm"]["timings"]["local_cliques"] > 0
            assert r["warm"]["max_err"] < 1.0, r["warm"]["max_err"]
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6


class TestReferenceParityWorkloads:
    """The reference-multiproc semantic carve-outs, closed (VERDICT r3
    item 1): multihypo association, joint up-messages, and the fourdoor
    incremental sequence all run under the 2-process path."""

    def test_two_process_multihypo(self):
        reps = launch_multihost(2, "multihypo_forest", scale=4,
                                devices_per_proc=1, timeout=900)
        for r in reps:
            # mx must associate with the d0 door (mean near b, not b+25)
            assert r["warm"]["max_err"] < 1.5, r["warm"]["max_err"]
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6

    def test_two_process_joint_up_messages(self):
        """use_msg_likelihoods=True across the cut: the joint payload
        rides its dedicated codec slots instead of degrading to plain
        separator beliefs."""
        reps = launch_multihost(2, "anchored_forest", scale=6,
                                devices_per_proc=1, timeout=900,
                                use_joint=True)
        for r in reps:
            assert r["warm"]["max_err"] < 1.0, r["warm"]["max_err"]
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6

    def test_two_process_fourdoor_sequence(self):
        """The classic fourdoor multimodal incremental story
        (fourdoortest.jl:12-54) across 2 processes: 3 solves with
        old_tree= recycling; final mode-mass bars at the reference's own
        tolerances, identical on every process."""
        reps = launch_multihost(2, "fourdoor", devices_per_proc=1,
                                timeout=900)
        f0, f1 = reps[0]["fourdoor"], reps[1]["fourdoor"]
        for k in ("x1_0", "x2_50", "x3_100", "x4_300"):
            assert f0[k] >= 0.8, (k, f0[k])      # test_solve.py bars
            assert abs(f0[k] - f1[k]) < 1e-9
        for v, c in (("x1", 0.0), ("x2", 50.0), ("x3", 100.0),
                     ("x4", 300.0)):
            assert abs(f0["means"][v] - c) < 10.0, (v, f0["means"][v])
            assert abs(f0["means"][v] - f1["means"][v]) < 1e-6


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


class TestProcessDeviceComposition:
    """Round-5 (VERDICT r4 item #2): subtree partition ACROSS processes
    composed with each process's own device mesh (the reference's
    workers x threads composition, SolveTree.jl:4-19 +
    ParametricUtils.jl:446-483)."""

    def test_two_process_two_device_mesh_parity(self):
        reps = launch_multihost(2, "anchored_forest", scale=6,
                                devices_per_proc=2, timeout=900,
                                mesh=True)
        assert len(reps) == 2
        truth = fixture_truth("anchored_forest", 6)
        fg = build_fixture("anchored_forest", 6)
        solve_tree_multihost(fg)
        single_errs = [abs(float(np.asarray(fg.points(v))[:, 0].mean()) - mu)
                       for v, mu in truth.items()]
        bar = max(1.0, 3.0 * max(single_errs))
        for r in reps:
            assert r["mesh_devices"] == 2     # local mesh per process
            assert r["devices"] == 4          # global runtime unchanged
            for phase in ("cold", "warm"):
                assert r[phase]["max_err"] < bar, (r["pid"], phase,
                                                   r[phase]["max_err"])
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6

    def test_two_process_four_device_mesh_wide_forest(self):
        """2 procs x 4 virtual devices each — the dryrun_multichip-style
        process x device variant: wide owned levels engage the local
        batched clique-sharded solve (batch_min_width=3 so each process's
        4 owned forest branches batch; scale stays small because the
        4-partition stacked compiles are minutes-slow on this 2-core
        CPU rig at larger widths)."""
        reps = launch_multihost(2, "forest", scale=8,
                                devices_per_proc=4, timeout=900,
                                mesh=True, batch_min_width=3)
        truth = fixture_truth("forest", 8)
        fg = build_fixture("forest", 8)
        solve_tree_multihost(fg)
        single_errs = [abs(float(np.asarray(fg.points(v))[:, 0].mean()) - mu)
                       for v, mu in truth.items()]
        bar = max(1.0, 3.0 * max(single_errs))
        for r in reps:
            assert r["mesh_devices"] == 4
            for phase in ("cold", "warm"):
                assert r[phase]["max_err"] < bar, (r["pid"], phase,
                                                   r[phase]["max_err"])
        assert abs(reps[0]["warm"]["max_err"]
                   - reps[1]["warm"]["max_err"]) < 1e-6
