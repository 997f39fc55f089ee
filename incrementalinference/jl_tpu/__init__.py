"""incrementalinference.jl_tpu — TPU-native factor-graph inference.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
JuliaRobotics/IncrementalInference.jl (MM-iSAMv2): nonparametric
(particle/KDE) and parametric inference over factor graphs on the Bayes
(junction) tree.  See SURVEY.md for the reference analysis this build
follows.
"""

from .beliefs import Belief, kde_logpdf, kde_sample, make_belief, mean_cov, ppe
from .config import SolverParams
from .distributions import (AliasingScalarSampler, Categorical,
                            ManifoldKernelDensity, MvNormal, Normal,
                            Rayleigh, Uniform, manikde)
from .graph import (Circular, ContinuousEuclid, ContinuousScalar, Factor,
                    FactorGraph, Position, Position1, Position2, Position3,
                    Position4, Variable, VariableType, initfg)
from .graphinit import doautoinit, init_all, init_variable
from . import manifolds
from .manifolds import SE2, SE3, SO2, SO3, Circle, Euclidean
from .models import (CircularCircular, DERelative, EuclidDistance,
                     FluxModelsDistribution, GenericMarginal,
                     HeatmapGridDensity, LevelSetGridNormal, LinearRelative,
                     ManifoldFactor, ManifoldPrior, MetaPrior, Mixture,
                     MixtureFluxModels, MsgPrior, PartialPrior,
                     PartialPriorPassThrough, Prior, PriorCircular,
                     SequentialNet, nn_init,
                     FactorModel, PriorModel, register_factor_model)
from .ops import (approx_conv_belief, approx_conv_path, eval_factor,
                  find_shortest_path_dijkstra, is_path_factors_homogeneous,
                  local_product, manifold_product, propagate_belief,
                  sample_factor)
from .api import (approx_cliq_marginal_up, fifo_freeze, set_ppe,
                  solve_cliq_down, solve_cliq_up,
                  solve_cliq_with_state_machine, solve_graph, solve_tree,
                  warmup)
from .tree import (BayesTree, CliqStatus, build_tree, build_tree_reset,
                   get_elimination_order)
from . import canonical
from . import debugging
from . import serialization
from .ops.deconv import approx_deconv, approx_deconv_belief, mmd
from .ops.gradients import FactorGradientsCached, factor_jacobian
from .parametric import (autoinit_parametric, solve_conditionals_parametric,
                         solve_graph_parametric)
from .serialization import (load_dfg_archive, load_graph, load_tree,
                            save_dfg_archive, save_graph, save_tree)
from .tether import accumulate_factor_means, solve_factor_parametric
from .utils import (compare_all_special, compare_beliefs, compare_factors,
                    compare_graphs, compare_variables, incr_suffix,
                    select_factor_type)
from . import fgos
from .fgos import *  # noqa: F401,F403 — graph accessor surface
from . import compat
from .compat import (AbstractBayesTree, AbstractFactor,
                     AbstractManifoldMinimize, AbstractPrior,
                     AbstractRelative, AbstractRelativeMinimize, BeliefArray,
                     CalcFactor, CliqStateMachineContainer,
                     CommonConvWrapper, DFGFactorSummary, DFGVariableSummary,
                     GraphsDFG, InferenceVariable, LocalDFG,
                     PackedAliasingScalarSampler, PackedBayesTreeNodeData,
                     PackedCategorical, PackedDiagNormal,
                     PackedFluxModelsDistribution, PackedFullNormal,
                     PackedFunctionNodeData, PackedGenericMarginal,
                     PackedHeatmapGridDensity, PackedLevelSetGridNormal,
                     PackedManifoldKernelDensity, PackedMixture,
                     PackedMsgPrior, PackedNormal, PackedPartialPrior,
                     PackedPrior, PackedRayleigh, PackedSamplableBelief,
                     PackedUniform, PackedZeroMeanDiagNormal,
                     PackedZeroMeanFullNormal, TreeBelief, diagm,
                     factor_summary, get_solver_params, variable_summary)
from . import datastore
from .datastore import (BlobEntry, FolderStore, InMemoryBlobStore, add_blob,
                        add_blob_store, add_data, delete_data,
                        fetch_data_json, get_blob, get_blob_store, get_data,
                        list_blob_entries, list_blob_stores,
                        list_data_entries)
from .tree import accessors as tree_accessors
from .tree.accessors import *  # noqa: F401,F403 — clique accessor surface

__version__ = "0.1.0"
