"""Migrating from IncrementalInference.jl: load a saveDFG archive and solve.

The reference ecosystem persists graphs with ``saveDFG(fg, path)`` — a
tar.gz (or directory) of per-variable/per-factor packed JSON
(DispatchPackedConversions.jl:25-160, SerializingDistributions.jl:4-38).
``serialization.load_dfg_archive`` rebuilds a solvable graph here from
that wire format: packed distributions (Normal/FullNormal/DiagNormal/
Uniform/Categorical/Rayleigh/AliasingScalarSampler/MKD), the standard
factor zoo (Prior/LinearRelative/EuclidDistance/Circular*/PartialPrior/
Mixture), variable types (ContinuousScalar/Position{N}/Circular/...),
1-based->0-based index shifts, and point-major vecval/vecbw solver data.

Run: PYTHONPATH=.:$PYTHONPATH python examples/migrate_from_reference.py
"""

import os
import sys
import tempfile

import jax

if jax.default_backend() == "cpu":
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-verify")
else:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tpu")
jax.config.update("jax_persistent_cache_enable_xla_caches", "none")

import numpy as np  # noqa: E402

from incrementalinference.jl_tpu import solve_tree  # noqa: E402
from incrementalinference.jl_tpu.serialization import (  # noqa: E402
    load_dfg_archive, save_dfg_archive)

# the repo ships a golden archive matching the reference's packed structs
# (tests/fixtures/dfg_archive); pass your own saveDFG tar.gz instead
ARCHIVE = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "fixtures", "dfg_archive")


def main() -> None:
    fg = load_dfg_archive(ARCHIVE)
    print(f"loaded: {len(fg.ls())} variables {sorted(fg.ls())}, "
          f"{len(fg.lsf())} factors")
    for v in sorted(fg.ls()):
        var = fg.var(v)
        print(f"  {v}: {var.vartype.name} "
              f"(initialized={var.is_initialized()})")

    solve_tree(fg)

    print("posterior means after solve_tree:")
    for v in sorted(fg.ls()):
        mu = np.asarray(fg.points(v)).mean(axis=0)
        print(f"  {v}: {np.round(mu, 2)}")

    # migrating back (or exchanging with a running Caesar stack):
    # save_dfg_archive writes the same saveDFG layout, solved beliefs
    # included, so the reference's loadDFG (or load_dfg_archive here)
    # can pick the session back up
    out = os.path.join(tempfile.gettempdir(), "migrated_back.tar.gz")
    save_dfg_archive(fg, out)
    fg2 = load_dfg_archive(out)
    print(f"round-trip: wrote {out}, re-imported "
          f"{len(fg2.ls())} variables / {len(fg2.lsf())} factors")


if __name__ == "__main__":
    main()
