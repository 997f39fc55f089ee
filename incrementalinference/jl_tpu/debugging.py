"""Scheduler forensics: trace printing, replay, tree visualization.

Reference: src/services/TreeDebugTools.jl (printCliqHistorySummary :189-253,
printCSMHistoryLogical/Sequential :254-511, repeatCSMStep! :513-554, tree
drawing via graphviz JunctionTreeUtils.jl:578-668).
"""

from __future__ import annotations

import time
from typing import Dict, Optional

from .parallel.scheduler import CliqueTrace, up_solve_clique
from .tree.bayestree import BayesTree, CliqStatus

__all__ = ["print_clique_history", "print_history_sequential",
           "tree_to_dot", "save_tree_dot", "replay_clique_up",
           "graph_to_dot", "save_graph_dot"]


def print_clique_history(traces: Dict[int, CliqueTrace],
                         cid: Optional[int] = None) -> str:
    """Summarise one (or all) clique trace(s) (reference
    printCliqHistorySummary)."""
    lines = []
    for c, tr in sorted(traces.items()):
        if cid is not None and c != cid:
            continue
        lines.append(f"clique {c}:")
        t0 = tr.events[0][0] if tr.events else 0.0
        for ts, step, detail in tr.events:
            lines.append(f"  +{ts - t0:8.3f}s  {step:<18} {detail}")
    out = "\n".join(lines)
    print(out)
    return out


def print_history_sequential(traces: Dict[int, CliqueTrace]) -> str:
    """Global time-ordered event stream across cliques (reference
    printCSMHistorySequential)."""
    events = [(ts, c, step, detail) for c, tr in traces.items()
              for ts, step, detail in tr.events]
    events.sort()
    t0 = events[0][0] if events else 0.0
    lines = [f"+{ts - t0:8.3f}s  cliq{c:<4} {step:<18} {detail}"
             for ts, c, step, detail in events]
    out = "\n".join(lines)
    print(out)
    return out


_STATUS_COLOR = {
    CliqStatus.NULL: "gray", CliqStatus.NO_INIT: "orange",
    CliqStatus.INITIALIZED: "green", CliqStatus.UPSOLVED: "lightblue",
    CliqStatus.MARGINALIZED: "blue", CliqStatus.DOWNSOLVED: "lightgreen",
    CliqStatus.UPRECYCLED: "purple", CliqStatus.ERROR_STATUS: "red",
}


def tree_to_dot(tree: BayesTree) -> str:
    """Graphviz dot of the Bayes tree, clique colors encoding status
    (reference drawTree clique coloring, CliqueStateMachine.jl:314-315)."""
    lines = ["digraph BayesTree {", "  node [shape=ellipse];"]
    for c in tree.cliques.values():
        label = f"{c.cid}: {','.join(c.frontals)}"
        if c.separator:
            label += f" | {','.join(c.separator)}"
        color = _STATUS_COLOR.get(c.status, "gray")
        lines.append(f'  c{c.cid} [label="{label}", style=filled, '
                     f'fillcolor={color}];')
    for c in tree.cliques.values():
        if c.parent is not None:
            lines.append(f"  c{c.parent} -> c{c.cid};")
    lines.append("}")
    return "\n".join(lines)


def save_tree_dot(tree: BayesTree, path: str = "/tmp/iitpu/bt.dot") -> str:
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(tree_to_dot(tree))
    return path


def replay_clique_up(fg, tree: BayesTree, cid: int,
                     traces: Dict[int, CliqueTrace],
                     solve_key: str = "default"):
    """Re-execute a recorded clique up-solve from its captured input
    messages (reference repeatCSMStep!, TreeDebugTools.jl:513-554)."""
    tr = traces.get(cid)
    if tr is None or tr.child_msgs is None:
        raise ValueError(f"no recorded messages for clique {cid} "
                         f"(run with record_cliques=True)")
    return up_solve_clique(fg, tree, tree.clique(cid), tr.child_msgs,
                           solve_key)


def graph_to_dot(fg) -> str:
    """Graphviz dot of the factor graph itself (reference drawGraph/
    drawGraphCliq helpers, src/services/AdditionalUtils.jl)."""
    lines = ["graph FactorGraph {", "  node [fontsize=10];"]
    for v in fg.ls():
        init = fg.var(v).is_initialized()
        lines.append(f'  "{v}" [shape=ellipse, style=filled, '
                     f'fillcolor={"lightblue" if init else "lightgray"}];')
    for fl in fg.lsf():
        lines.append(f'  "{fl}" [shape=box, style=filled, '
                     f'fillcolor=lightyellow, '
                     f'label="{type(fg.factor(fl).model).__name__}"];')
        for v in fg.factor(fl).variables:
            lines.append(f'  "{fl}" -- "{v}";')
    lines.append("}")
    return "\n".join(lines)


def save_graph_dot(fg, path: str = "/tmp/iitpu/fg.dot") -> str:
    import os
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(graph_to_dot(fg))
    return path
