"""Symbolic layer: elimination ordering, Bayes net, Bayes (junction) tree."""

from .bayesnet import Conditional, build_bayes_net
from .bayestree import (BayesTree, Clique, CliqStatus, build_tree,
                        build_tree_reset)
from .ordering import get_elimination_order
from . import accessors
from .accessors import *  # noqa: F401,F403 — clique accessor surface

__all__ = [
    "get_elimination_order", "build_bayes_net", "Conditional",
    "BayesTree", "Clique", "CliqStatus", "build_tree", "build_tree_reset",
] + list(accessors.__all__)
