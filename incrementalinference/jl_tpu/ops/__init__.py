"""Numerics core: batched convolution, KDE products, hypothesis masks."""

from .convolve import (add_entropy, approx_conv_belief, batched_gauss_newton,
                       eval_factor, proposal_from_factor, sample_factor)
from .graphops import (approx_conv_path, find_shortest_path_dijkstra,
                       is_path_factors_homogeneous, local_product,
                       local_product_and_update, propagate_belief)
from .deconv import approx_deconv, approx_deconv_belief, mmd
from .gradients import (FactorGradientsCached, calc_perturbation_from_variable,
                        factor_jacobian)
from .hypo import build_masks, draw_hypotheses, parse_multihypo
from .product import Proposal, manifold_product, pair_product_tangent

__all__ = [
    "batched_gauss_newton", "add_entropy", "eval_factor",
    "approx_conv_belief", "proposal_from_factor", "sample_factor",
    "propagate_belief", "local_product", "local_product_and_update",
    "approx_conv_path", "find_shortest_path_dijkstra",
    "is_path_factors_homogeneous",
    "manifold_product", "pair_product_tangent", "Proposal",
    "draw_hypotheses", "build_masks", "parse_multihypo",
    "approx_deconv", "approx_deconv_belief", "mmd",
    "factor_jacobian", "FactorGradientsCached",
    "calc_perturbation_from_variable",
]
