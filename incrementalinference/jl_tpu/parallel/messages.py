"""Inter-clique belief messages.

Reference: src/entities/CliqueTypes.jl:41-74 (LikelihoodMessage,
MessageBuffer) and src/services/TreeMessageUtils.jl (addMsgFactors!,
prepCliqueMsgUp).  The reference moves these through unbuffered Channels
between clique Tasks; in the static schedule they are plain values handed
from one level to the next — and across hosts they are fixed-shape particle
blocks rides for collectives (SURVEY.md §2.9.5).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from ..beliefs import Belief, make_belief
from ..models.factors import MsgPrior, MsgRelativeLikelihood
from ..tree.bayestree import CliqStatus

__all__ = ["LikelihoodMessage", "JointMsg", "add_msg_factors",
           "delete_msg_factors", "prep_msg_up", "prep_msg_down",
           "generate_msg_joint"]

MSG_TAG = "__LIKELIHOODMESSAGE__"


@dataclass
class JointMsg:
    """Joint up-message payload (reference _MsgJointLikelihood,
    TreeMessageUtils.jl:446): deconv-derived relative likelihoods between
    separator pairs plus one anchoring prior per disconnected separator
    subgraph class."""

    # [(var_a, var_b, Belief over the tangent difference)]
    relatives: list = field(default_factory=list)
    # {var: Belief} — class-anchor priors
    priors: Dict[str, Belief] = field(default_factory=dict)


@dataclass
class LikelihoodMessage:
    """Belief message over separator variables."""

    sender: int
    status: CliqStatus
    beliefs: Dict[str, Belief] = field(default_factory=dict)
    # direction hint (reference :UPWARD_DIFFERENTIAL / :DOWNWARD_COMMON)
    direction: str = "up"
    # joint differential payload (reference LikelihoodMessage.jointmsg)
    jointmsg: Optional[JointMsg] = None
    # whether the sending clique carried any prior potentials (reference
    # LikelihoodMessage.hasPriors; gates joint-prior placement)
    has_priors: bool = False


def add_msg_factors(subfg, msg: LikelihoodMessage) -> List[str]:
    """Insert a message into a clique subgraph as factors (reference
    addMsgFactors!, TreeMessageUtils.jl:542-594).

    Default path: one MsgPrior per separator belief.  Joint path (upward +
    ``use_msg_likelihoods`` + jointmsg present): the deconv-derived relative
    likelihoods (:__UPWARD_DIFFERENTIAL__) plus class-anchor priors
    (:__UPWARD_COMMON__), the latter only when the sender saw priors or the
    variable would otherwise be factor-less (addLikelihoodPriorCommon!,
    TreeMessageUtils.jl:454-470)."""
    added = []
    use_joint = (subfg.params.use_msg_likelihoods and msg.direction == "up"
                 and msg.jointmsg is not None and msg.beliefs)
    if use_joint:
        jm = msg.jointmsg
        for va, vb, diff_belief in jm.relatives:
            if va not in subfg.variables or vb not in subfg.variables:
                continue
            manifold = subfg.var(va).manifold
            f = subfg.add_factor(
                [va, vb], MsgRelativeLikelihood(diff_belief, manifold),
                label=f"{va}{vb}_{MSG_TAG}J_{msg.sender}_{msg.direction}",
                graphinit=False, tags=(MSG_TAG, "__UPWARD_DIFFERENTIAL__"))
            added.append(f.label)
        for vlbl, belief in jm.priors.items():
            if vlbl not in subfg.variables:
                continue
            if not (msg.has_priors or len(subfg.factors_of(vlbl)) == 0):
                continue
            manifold = subfg.var(vlbl).manifold
            f = subfg.add_factor(
                [vlbl], MsgPrior(belief, manifold),
                label=f"{vlbl}_{MSG_TAG}_{msg.sender}_{msg.direction}",
                graphinit=False, tags=(MSG_TAG, "__UPWARD_COMMON__"))
            added.append(f.label)
        return added

    for vlbl, belief in msg.beliefs.items():
        if vlbl not in subfg.variables:
            continue
        manifold = subfg.var(vlbl).manifold
        f = subfg.add_factor(
            [vlbl], MsgPrior(belief, manifold),
            label=f"{vlbl}_{MSG_TAG}_{msg.sender}_{msg.direction}",
            graphinit=False, tags=(MSG_TAG,))
        added.append(f.label)
    return added


def delete_msg_factors(subfg, labels: List[str] | None = None) -> None:
    """Remove message factors (reference deleteMsgFactors!,
    TreeMessageUtils.jl:609-624)."""
    if labels is None:
        labels = [fl for fl in subfg.lsf() if MSG_TAG in fl]
    for fl in labels:
        f = subfg.factors.pop(fl, None)
        if f is None:
            continue
        for vl in f.variables:
            if fl in subfg._var_factors.get(vl, ()):
                subfg._var_factors[vl].remove(fl)


def _localize(pts):
    """Pull a multi-device-sharded particle block to one device before any
    EAGER op — eager slicing/logs on sharded arrays hard-abort XLA:CPU
    (same guard as beliefs.ppe)."""
    sh = getattr(pts, "sharding", None)
    if sh is not None and len(getattr(sh, "device_set", ())) > 1:
        import numpy as _np

        import jax.numpy as _jnp
        return _jnp.asarray(_np.asarray(pts))
    return pts


def _subfg_has_priors(subfg) -> bool:
    """Whether the clique subgraph carries any prior potential — INCLUDING
    message priors inserted from child messages, so the flag propagates up
    a branch ("true only if a prior occurred here or lower down in tree
    branch", reference prepCliqueMsgUp lsfPriors(subfg),
    TreeMessageUtils.jl:665-682)."""
    return any(subfg.factor(fl).is_prior for fl in subfg.lsf())


def generate_msg_joint(subfg, clique, solve_key: str = "default",
                       has_priors: bool | None = None) -> JointMsg:
    """Build the joint up-message payload (reference
    _generateMsgJointRelativesPriors, TreeMessageUtils.jl:423-447).

    Relatives: for separator pairs (descending manifold dimension) whose
    connecting factor path inside the clique subgraph is homogeneous AND of
    the pair's default factor type, a deconv-derived relative likelihood —
    per-particle tangent differences of the solved beliefs, the closed-form
    deconv of LinearRelative/ManifoldFactor (addLikelihoodsDifferentialCHILD!,
    TreeMessageUtils.jl:279-335).

    Priors: separators are grouped into connectivity classes by paths
    restricted to the default factor type (_findSubgraphsFactorType,
    :126-205); each class contributes one anchor prior on its highest-
    dimension / highest-adjacency variable (_calcCandidatePriorBest +
    _generateSubgraphMsgPriors, :339-412)."""
    from ..manifolds import Euclidean
    from ..ops.graphops import (find_shortest_path_dijkstra,
                                is_path_factors_homogeneous)
    from ..utils.defaults import select_factor_type

    jm = JointMsg()
    if has_priors is None:
        has_priors = _subfg_has_priors(subfg)
    seps = [s for s in clique.separator
            if subfg.var(s).is_initialized(solve_key)]
    if not seps:
        return jm

    def _default_type(va, vb):
        try:
            return type(select_factor_type(subfg.var(va).vartype,
                                           subfg.var(vb).vartype))
        except ValueError:
            return None

    # 1. deconv-derived relatives over homogeneous same-default-type paths
    order = sorted(seps, key=lambda s: -subfg.var(s).manifold.dof)
    rel_count = {s: 0 for s in seps}
    for i, va in enumerate(order):
        for vb in order[i + 1:]:
            ma = subfg.var(va).manifold
            if ma != subfg.var(vb).manifold:
                continue
            is_hom, ftypes = is_path_factors_homogeneous(subfg, va, vb)
            if not is_hom or not ftypes:
                continue
            dtype = _default_type(va, vb)
            if dtype is None or dtype.__name__ != ftypes[0]:
                continue
            pa = _localize(subfg.points(va, solve_key))
            pb = _localize(subfg.points(vb, solve_key))
            n = min(pa.shape[0], pb.shape[0])
            diffs = ma.log(pa[:n], pb[:n])
            jm.relatives.append((va, vb,
                                 make_belief(Euclidean(ma.dof), diffs)))
            rel_count[va] += 1
            rel_count[vb] += 1

    # 2. connectivity classes under the default factor type
    assigned: Dict[str, int] = {}
    nclass = 0
    for s in seps:                     # relative-less separators first
        if rel_count[s] == 0:
            assigned[s] = nclass
            nclass += 1
    remaining = [s for s in seps if s not in assigned]
    for k, va in enumerate(remaining):
        if va not in assigned:
            assigned[va] = nclass
            nclass += 1
        for vb in remaining[k + 1:]:
            if vb in assigned:
                continue
            dtype = _default_type(va, vb)
            path = [] if dtype is None else find_shortest_path_dijkstra(
                subfg, va, vb, type_factors=(dtype,), initialized=True,
                solve_key=solve_key)
            if path:
                assigned[vb] = assigned[va]
            else:
                assigned[vb] = nclass
                nclass += 1
    classes: Dict[int, list] = {}
    for s, c in assigned.items():
        classes.setdefault(c, []).append(s)

    # 3. one anchor prior per class on the best candidate variable —
    # only for singleton classes unless the clique itself saw priors
    # (_generateSubgraphMsgPriors gating, TreeMessageUtils.jl:400-407)
    for syms in classes.values():
        if not (len(syms) == 1 or has_priors):
            continue
        max_dof = max(subfg.var(s).manifold.dof for s in syms)
        cands = [s for s in syms if subfg.var(s).manifold.dof == max_dof]
        best = max(cands, key=lambda s: len(subfg.factors_of(s)))
        jm.priors[best] = subfg.get_belief(best, solve_key)
    return jm


def prep_msg_up(subfg, clique, status: CliqStatus,
                solve_key: str = "default") -> LikelihoodMessage:
    """Separator beliefs → up message; with ``use_msg_likelihoods`` also
    attach the joint differential payload (reference prepCliqueMsgUp,
    TreeMessageUtils.jl:667-703)."""
    msg = LikelihoodMessage(sender=clique.cid, status=status, direction="up")
    for vlbl in clique.separator:
        # during the tree-init dance a NO_INIT message may be sent before
        # all separators have beliefs — carry only what exists (the
        # reference's status-only LikelihoodMessage)
        if solve_key in subfg.var(vlbl).beliefs:
            msg.beliefs[vlbl] = subfg.get_belief(vlbl, solve_key)

    # did this clique carry prior potentials? (reference hasPriors check,
    # TreeMessageUtils.jl:430)
    msg.has_priors = _subfg_has_priors(subfg)

    # joint payload only on solved up-messages (the reference builds the
    # jointmsg in postUpSolve_, after the clique upsolve — init-phase
    # messages carry plain beliefs)
    if (subfg.params.use_msg_likelihoods and clique.separator
            and status == CliqStatus.UPSOLVED):
        msg.jointmsg = generate_msg_joint(subfg, clique, solve_key,
                                          has_priors=msg.has_priors)
    return msg


def prep_msg_down(subfg, clique, child, status: CliqStatus,
                  solve_key: str = "default") -> LikelihoodMessage:
    """Beliefs of a child's separator vars → down message (reference
    postDownSolve_ separator pass-through, CliqueStateMachine.jl:866-914)."""
    msg = LikelihoodMessage(sender=clique.cid, status=status,
                            direction="down")
    for vlbl in child.separator:
        # an uninitializable clique (NO_INIT down pass-through) may lack
        # beliefs for some separators — carry only what exists
        if vlbl in subfg.variables and \
                solve_key in subfg.var(vlbl).beliefs:
            msg.beliefs[vlbl] = subfg.get_belief(vlbl, solve_key)
    return msg
