"""Solver configuration.

TPU-native analogue of the reference's ``SolverParams``
(reference: src/entities/SolverParams.jl:12-75).  A frozen-ish dataclass
attached to each :class:`~incrementalinference.jl_tpu.graph.FactorGraph`;
per-call keyword overrides on the solve entry points take precedence.
"""

from __future__ import annotations

import dataclasses
from typing import Any


@dataclasses.dataclass
class SolverParams:
    """Global solver knobs.

    Field parity with the reference's SolverParams (SolverParams.jl:12-75),
    re-expressed for a statically-scheduled TPU solver.  Fields that only
    made sense for the Julia task/channel runtime (``multiproc``, ``dbg``
    async-drawing, …) are replaced by their scheduler equivalents in
    :mod:`incrementalinference.jl_tpu.parallel`.
    """

    # Particle count per marginal belief (reference default N=100).
    N: int = 100
    # Solve-key bookkeeping: which algorithms get per-variable solver data.
    algorithms: tuple = ("default", "parametric")
    # Auto-initialize variables from factor neighborhoods on addFactor.
    graphinit: bool = True
    # Incremental tree recycling between solves.
    incremental: bool = True
    # Use joint/likelihood up-messages (reference useMsgLikelihoods).
    use_msg_likelihoods: bool = False
    # Entropy inflation factor for convolution proposals (reference inflation=5.0).
    inflation: float = 5.0
    # Spread multiplier for null-hypothesis entropy (reference spreadNH=3.0).
    spread_nh: float = 3.0
    # nullSurplus boost for relative non-multihypo siblings of a multihypo
    # factor at a proposal target (reference nullSurplusAdd=0.3,
    # SolverParams.jl:61 / ApproxConv.jl:253-265, issue #1517).
    null_surplus_add: float = 0.3
    # Gibbs iterations per clique solve (reference gibbsIters=3).
    gibbs_iters: int = 3
    # Inflation/solve cycles per convolution (reference inflateCycles=3).
    inflate_cycles: int = 3
    # Fixed-lag marginalization window (0 = disabled; reference qfl/isfixedlag).
    qfl: int = 0
    is_fixed_lag: bool = False
    fixed_lag_only_clique_side: bool = False
    # Runaway guard on the per-clique init cycling (reference limititers=500
    # bounds CSM steps; here it bounds _cycle_init_by_var_order passes —
    # the loop exits early once a pass changes nothing).
    limit_iters: int = 500
    # Bound on tree-init fixed-point passes: after a down sweep that
    # down-initializes previously NO_INIT cliques, the up sweep re-runs over
    # the affected subtree and the down sweep repeats, at most this many
    # times (reference limittreeinit_iters=10 stall detection,
    # SolverParams.jl:53 / CliqueStateMachine.jl:573-585).
    limit_treeinit_iters: int = 10
    # Max factors per variable before the graph builder refuses (maxincidence).
    max_incidence: int = 500
    # Elimination ordering: "qr" | "colamd" | "ccolamd" (constrained).
    # The native constrained min-degree (ccolamd) yields substantially
    # lower-cost trees than the reference's default QR pivoting and is the
    # default here; "qr" matches the reference's default path exactly.
    ordering: str = "ccolamd"
    # Gauss-Newton iterations for the batched per-particle solve.
    conv_iters: int = 25
    # Levenberg damping for the batched per-particle solve.
    conv_damping: float = 1e-6
    # Gibbs sweeps inside the KDE manifold product.
    product_gibbs_sweeps: int = 3
    # Upsolve only / downsolve only switches (reference upsolve/downsolve).
    upsolve: bool = True
    downsolve: bool = True
    # Log path for per-clique traces (reference logpath).
    logpath: str = "/tmp/iitpu"
    # RNG seed used when the caller does not pass a key.
    seed: int = 42
    # Record per-clique scheduler traces (reference CSM history).
    record_cliques: bool = False
    # dtype for belief/particle arrays ("float32" is TPU-native).
    dtype: str = "float32"
    # Batch same-structure variable updates across same-level cliques into
    # one vmapped kernel over a per-level stacked particle store (lock-step
    # Gibbs; statistics match the sequential path). "auto" batches levels
    # with >= batch_min_width cliques (measured 1.7x at 64 cliques x N=256;
    # neutral below ~8). The fault-injection/device-distribution paths use
    # the sequential sweep.
    batch_cliques: object = "auto"
    batch_min_width: int = 8
    # Width-aware multi-device policy for narrow (unbatched) levels when a
    # mesh is passed to solve_tree/solve_tree_multihost: shard the clique
    # store's PARTICLE axis across the mesh ("auto"/True), or keep narrow
    # cliques single-device (False).  Wide levels >= batch_min_width use
    # clique batching+sharding regardless (round-5, VERDICT r4 item #3).
    shard_particles: object = "auto"
    # Trace a clique's whole Gibbs schedule (direct vars once, iter vars ×
    # gibbs_iters) into ONE jitted dispatch, cached per clique-structure
    # signature (isomorphic cliques share the compile; remaining Gibbs
    # rounds ride a lax.scan so compile cost is ~2 rounds). Falls back to
    # the per-variable fused path when the structure is unsupported.
    # "auto" = on for accelerator backends (3x headline win on TPU v5e:
    # 0.11 s → 0.033 s LineStep(20)), off on CPU where dispatch is cheap
    # and the big chain programs trip an XLA:CPU cache-serialization bug.
    fuse_clique: object = "auto"
    # EXPERIMENTAL: fuse RUNS of single-child cliques (chain segments of
    # the tree) into one jitted dispatch for the whole segment up sweep,
    # substituting the inter-clique up-message in-trace.  Measured on TPU
    # v5e (LineStep(20)): the merged 10-clique program compiles 15x slower
    # AND executes ~10x slower than the per-clique fused chains — XLA's
    # scheduling of the small per-clique programs beats the monolith — so
    # the default stays OFF ("auto" == False until that inverts on some
    # backend).  Statistics are identical either way (covered by tests).
    fuse_sweep: object = "auto"
    # iSAM2-style wildfire gate for incremental down-solves: a recycled
    # (UPRECYCLED) clique skips its down-solve when the incoming down
    # message moved less than ``wildfire_tol`` bandwidth-normalized units
    # since the previous solve (0.0 = off, always re-derive — the
    # reference's behavior, CliqueStateMachine.jl down states).
    # "auto" enables the gate (at scheduler.WILDFIRE_AUTO_TOL) only when
    # the solve recycles at least scheduler.WILDFIRE_AUTO_MIN_RECYCLED
    # cliques — the measured crossover where the gate's one device->host
    # statistic sync pays for the skipped down-solves (BASELINE.md
    # "Wildfire gate: measured crossover": gate loses at 30 poses, wins
    # 2.2x at 120; crossover ~60-80 recycled cliques on TPU v5e).  The
    # default stays 0.0: exact reference down-solve semantics.
    wildfire_tol: object = 0.0

    def replace(self, **kw: Any) -> "SolverParams":
        return dataclasses.replace(self, **kw)
