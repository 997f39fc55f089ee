"""incrementalinference — TPU-native factor-graph inference.

The framework lives in :mod:`incrementalinference.jl_tpu`; the top level
re-exports its public API so ``import incrementalinference as ii`` works the
way ``using IncrementalInference`` does in the reference.
"""

from .jl_tpu import *          # noqa: F401,F403
from .jl_tpu import __version__  # noqa: F401
