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
from typing import Dict, List

from ..beliefs import Belief, make_belief
from ..models.factors import MsgPrior, MsgRelativeLikelihood
from ..tree.bayestree import CliqStatus

__all__ = ["LikelihoodMessage", "add_msg_factors", "delete_msg_factors",
           "prep_msg_up", "prep_msg_down"]

MSG_TAG = "__LIKELIHOODMESSAGE__"


@dataclass
class LikelihoodMessage:
    """Belief message over separator variables."""

    sender: int
    status: CliqStatus
    beliefs: Dict[str, Belief] = field(default_factory=dict)
    # direction hint (reference :UPWARD_DIFFERENTIAL / :DOWNWARD_COMMON)
    direction: str = "up"
    # joint differential likelihoods: [(var_a, var_b, Belief-over-diff)]
    # (reference LikelihoodMessage.jointmsg::_MsgJointLikelihood)
    joint: list = field(default_factory=list)


def add_msg_factors(subfg, msg: LikelihoodMessage) -> List[str]:
    """Insert message beliefs as MsgPrior factors — plus, on the joint-
    likelihood path, differential relative factors between separator pairs
    (reference addMsgFactors!, TreeMessageUtils.jl:542-594)."""
    added = []
    for vlbl, belief in msg.beliefs.items():
        if vlbl not in subfg.variables:
            continue
        manifold = subfg.var(vlbl).manifold
        f = subfg.add_factor(
            [vlbl], MsgPrior(belief, manifold),
            label=f"{vlbl}_{MSG_TAG}_{msg.sender}_{msg.direction}",
            graphinit=False, tags=(MSG_TAG,))
        added.append(f.label)
    for va, vb, diff_belief in msg.joint:
        if va not in subfg.variables or vb not in subfg.variables:
            continue
        manifold = subfg.var(va).manifold
        f = subfg.add_factor(
            [va, vb], MsgRelativeLikelihood(diff_belief, manifold),
            label=f"{va}{vb}_{MSG_TAG}J_{msg.sender}_{msg.direction}",
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


def prep_msg_up(subfg, clique, status: CliqStatus,
                solve_key: str = "default") -> LikelihoodMessage:
    """Separator beliefs → up message; with ``use_msg_likelihoods`` also
    attach differential likelihoods between consecutive separator variables
    (reference prepCliqueMsgUp + addLikelihoodsDifferentialCHILD!,
    TreeMessageUtils.jl:667-703, :279-335)."""
    from ..manifolds import Euclidean

    msg = LikelihoodMessage(sender=clique.cid, status=status, direction="up")
    for vlbl in clique.separator:
        msg.beliefs[vlbl] = subfg.get_belief(vlbl, solve_key)

    if subfg.params.use_msg_likelihoods and len(clique.separator) >= 2:
        seps = sorted(clique.separator)
        for va, vb in zip(seps[:-1], seps[1:]):
            ma = subfg.var(va).manifold
            if ma != subfg.var(vb).manifold:
                continue
            pa = subfg.points(va, solve_key)
            pb = subfg.points(vb, solve_key)
            n = min(pa.shape[0], pb.shape[0])
            # per-particle tangent differences = deconv of an implicit
            # relative factor between the two solved separator beliefs
            diffs = ma.log(pa[:n], pb[:n])
            diff_belief = make_belief(Euclidean(ma.dof), diffs)
            msg.joint.append((va, vb, diff_belief))
    return msg


def prep_msg_down(subfg, clique, child, status: CliqStatus,
                  solve_key: str = "default") -> LikelihoodMessage:
    """Beliefs of a child's separator vars → down message (reference
    postDownSolve_ separator pass-through, CliqueStateMachine.jl:866-914)."""
    msg = LikelihoodMessage(sender=clique.cid, status=status,
                            direction="down")
    for vlbl in child.separator:
        if vlbl in subfg.variables:
            msg.beliefs[vlbl] = subfg.get_belief(vlbl, solve_key)
    return msg
