"""Native C++ ordering tests (reference testCcolamdOrdering.jl analogue)."""

from incrementalinference.jl_tpu.canonical import (generate_line_step,
                                                   generate_test_symbolic)
from incrementalinference.jl_tpu.native import native_available, native_ccolamd
from incrementalinference.jl_tpu.tree import build_tree, get_elimination_order
from incrementalinference.jl_tpu.tree.analysis import tree_cost_01


def test_native_builds_and_orders():
    assert native_available()
    order = native_ccolamd(5, [[0, 1], [1, 2], [2, 3], [3, 4]],
                           [1, 0, 0, 0, 0])
    assert sorted(order) == [0, 1, 2, 3, 4]
    assert order[-1] == 0                     # constrained group last


def test_ccolamd_order_valid_and_constrained():
    fg = generate_test_symbolic()
    order = get_elimination_order(fg, "ccolamd")
    assert sorted(order) == sorted(fg.ls())
    order2 = get_elimination_order(fg, "ccolamd", constraints=["x5", "x4"])
    assert set(order2[-2:]) == {"x4", "x5"}


def test_ccolamd_beats_qr_on_line_graph():
    fg = generate_line_step(40, graphinit=False)
    cost_md = tree_cost_01(build_tree(
        fg, order=get_elimination_order(fg, "ccolamd")))
    cost_qr = tree_cost_01(build_tree(
        fg, order=get_elimination_order(fg, "qr")))
    assert cost_md <= cost_qr
