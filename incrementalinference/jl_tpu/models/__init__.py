"""Model library: factors and variable types (reference SURVEY.md §2.7)."""

from .factors import (CircularCircular, EuclidDistance, FactorModel,
                      GenericMarginal, LinearRelative, ManifoldFactor,
                      ManifoldPrior, MetaPrior, Mixture, MsgPrior,
                      PartialPrior, Prior, PriorCircular, PriorModel)

__all__ = [
    "FactorModel", "PriorModel", "Prior", "LinearRelative", "EuclidDistance",
    "Mixture", "PriorCircular", "CircularCircular", "PartialPrior",
    "MsgPrior", "MetaPrior", "GenericMarginal", "ManifoldFactor",
    "ManifoldPrior",
]
