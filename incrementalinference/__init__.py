"""incrementalinference — TPU-native factor-graph inference.

The actual framework lives in :mod:`incrementalinference.jl_tpu`.
"""
