"""Model library: factors, variable types, extension densities
(reference SURVEY.md §2.7 + ext/)."""

from .densities import (HeatmapGridDensity, LevelSetGridNormal,
                        PartialPriorPassThrough)
from .factors import (CircularCircular, EuclidDistance, FactorModel, GaussianJoint,
                      GenericMarginal, LinearRelative, ManifoldFactor,
                      ManifoldPrior, MetaPrior, Mixture, MsgPrior,
                      PartialPrior, Prior, PriorCircular, PriorModel,
                      register_factor_model)
from .flux import (FluxModelsDistribution, MixtureFluxModels, SequentialNet,
                   mlp_apply, mlp_init, nn_init)
from .ode import DERelative, rk4_integrate

__all__ = [
    "FactorModel", "PriorModel", "Prior", "LinearRelative", "EuclidDistance",
    "Mixture", "PriorCircular", "CircularCircular", "PartialPrior",
    "MsgPrior", "MetaPrior", "GenericMarginal", "ManifoldFactor",
    "ManifoldPrior", "GaussianJoint", "register_factor_model",
    "HeatmapGridDensity", "LevelSetGridNormal", "PartialPriorPassThrough",
    "FluxModelsDistribution", "MixtureFluxModels", "SequentialNet",
    "mlp_init", "mlp_apply", "nn_init",
    "DERelative", "rk4_integrate",
]
