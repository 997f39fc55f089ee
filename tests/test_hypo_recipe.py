"""Hypothesis-recipe semantics (reference testExplicitMultihypo.jl,
testCalcFactorHypos.jl): per-particle hypothesis draws and the mask-world
equivalents of the reference's allelements/activehypo partitions
(_prepareHypoRecipe!, ExplicitDiscreteMarginalizations.jl:28-120)."""

import jax
import numpy as np

from incrementalinference.jl_tpu.ops.hypo import (build_masks,
                                                  draw_hypotheses,
                                                  parse_multihypo)

KEY = jax.random.PRNGKey(7)
N = 2000


def test_nullhypo_only_partition():
    """nullhypo=0.5, no multihypo: particles split ~half null / half active
    and every particle is in exactly one partition (reference
    testExplicitMultihypo.jl:7-34 'only nullhypothesis')."""
    mh = draw_hypotheses(KEY, N, 2, None, 0.5)
    m = np.asarray(mh)
    assert set(np.unique(m)) <= {0, 1}
    assert 0.4 * N < (m == 0).sum() < 0.6 * N
    assert (m == 0).sum() + (m == 1).sum() == N

    masks = build_masks(mh, 0, 2, None)
    sm = np.asarray(masks.solve_mask)
    nm = np.asarray(masks.null_mask)
    assert not (sm & nm).any()
    assert (sm | nm).all()
    assert not np.asarray(masks.snap_mask).any()
    assert masks.mech_vars == (0, 1)


def test_no_hypo_all_active():
    """No multihypo, no nullhypo: every particle solves (reference
    testExplicitMultihypo.jl:69-97)."""
    mh = draw_hypotheses(KEY, N, 2, None, 0.0)
    assert (np.asarray(mh) == 1).all()
    masks = build_masks(mh, 0, 2, None)
    assert np.asarray(masks.solve_mask).all()


def test_multihypo_certain_target_partitions():
    """multihypo [1, 1/2, 1/2], solving the certain var: active particles
    split ~evenly between the two hypotheses and gather the selected
    uncertain variable (reference testExplicitMultihypo.jl multihypo
    cases)."""
    multihypo = (1.0, 0.5, 0.5)
    certain, uncertain, weights = parse_multihypo(multihypo)
    assert certain == (0,) and uncertain == (1, 2) and weights == (0.5, 0.5)

    mh = draw_hypotheses(KEY, N, 3, multihypo, 0.0)
    m = np.asarray(mh)
    # ids: 0=null (none here), 2 and 3 = selected uncertain var index + 1
    assert (m == 0).sum() == 0
    assert 0.4 * N < (m == 2).sum() < 0.6 * N
    assert (m == 2).sum() + (m == 3).sum() == N

    masks = build_masks(mh, 0, 3, multihypo)
    assert np.asarray(masks.solve_mask).all()
    g = np.asarray(masks.gather_idx)
    np.testing.assert_array_equal(g, m - 1)      # factor-var index per draw
    assert masks.mech_vars == (0, 1)             # certain + uncertain slot
    assert masks.uncertain_slot == 1


def test_multihypo_uncertain_target_snap():
    """Solving an uncertain var: only its selected particles solve; the
    other hypothesis' particles are snap/nullhypo-spread (reference
    computeAcrossHypothesis! snap-together semantics,
    EvalFactor.jl:208-227)."""
    multihypo = (1.0, 0.5, 0.5)
    mh = draw_hypotheses(KEY, N, 3, multihypo, 0.1)
    m = np.asarray(mh)
    masks = build_masks(mh, 1, 3, multihypo)     # solve var index 1
    sm = np.asarray(masks.solve_mask)
    nm = np.asarray(masks.null_mask)
    sp = np.asarray(masks.snap_mask)
    np.testing.assert_array_equal(sm, m == 2)
    np.testing.assert_array_equal(nm, m == 0)
    np.testing.assert_array_equal(sp, (m != 0) & (m != 2))
    # the three partitions tile all particles exactly
    assert (sm.astype(int) + nm.astype(int) + sp.astype(int) == 1).all()
    # ~10% null, remaining split between solve and snap
    assert 0.05 * N < nm.sum() < 0.16 * N
    assert 0.35 * N < sm.sum() < 0.55 * N


def test_parse_multihypo_validation():
    assert parse_multihypo(None) is None
    assert parse_multihypo((1.0, 1.0)) is None      # all certain
    try:
        parse_multihypo((1.0, 0.4, 0.4))            # doesn't sum to 1
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
