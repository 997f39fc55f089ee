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

from ..beliefs import Belief
from ..models.factors import MsgPrior
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


def add_msg_factors(subfg, msg: LikelihoodMessage) -> List[str]:
    """Insert message beliefs as MsgPrior factors on the local (sub)graph
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


def prep_msg_up(subfg, clique, status: CliqStatus) -> LikelihoodMessage:
    """Separator beliefs → up message (reference prepCliqueMsgUp,
    TreeMessageUtils.jl:667-703)."""
    msg = LikelihoodMessage(sender=clique.cid, status=status, direction="up")
    for vlbl in clique.separator:
        msg.beliefs[vlbl] = subfg.get_belief(vlbl)
    return msg


def prep_msg_down(subfg, clique, child, status: CliqStatus) -> LikelihoodMessage:
    """Beliefs of a child's separator vars → down message (reference
    postDownSolve_ separator pass-through, CliqueStateMachine.jl:866-914)."""
    msg = LikelihoodMessage(sender=clique.cid, status=status,
                            direction="down")
    for vlbl in child.separator:
        if vlbl in subfg.variables:
            msg.beliefs[vlbl] = subfg.get_belief(vlbl)
    return msg
