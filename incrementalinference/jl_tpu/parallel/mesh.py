"""Device-mesh sharding for the solver's data-parallel axes.

Reference mapping (SURVEY.md §2.9): the reference distributes clique solves
over a Julia ``Distributed`` WorkerPool with serialized subgraphs
(src/services/SolveTree.jl:4-19, CliqStateMachineUtils.jl:349-410).  The
TPU-native axes are:

- **particles**: every belief/convolution batch dim shards across the mesh —
  conv kernels are particle-independent (SURVEY.md §2.9.4);
- **factors**: the parametric group evaluation shards across factors; XLA
  inserts the psum when JᵀJ/Jᵀr reduce (GSPMD — no hand-written NCCL);
- **cliques**: same-level cliques are independent; batches of padded clique
  solves shard across the mesh (level-synchronous schedule).

Everything here uses `jax.sharding.Mesh` + NamedSharding so it runs
identically on one chip, a virtual CPU mesh, or a pod slice (ICI
collectives).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_particles", "replicate", "shard_group_arrays",
           "sharded_normal_equations"]


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = "shard") -> Mesh:
    """1-D device mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis_name,))


def shard_particles(mesh: Mesh, arr: jnp.ndarray,
                    axis_name: str = "shard") -> jnp.ndarray:
    """Shard a particle-batched array (N, ...) across the mesh (pads N up to
    a mesh multiple if needed)."""
    n = arr.shape[0]
    per = mesh.devices.size
    pad = (-n) % per
    if pad:
        arr = jnp.concatenate([arr, jnp.repeat(arr[-1:], pad, axis=0)])
    spec = P(axis_name, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr: jnp.ndarray) -> jnp.ndarray:
    return jax.device_put(arr, NamedSharding(mesh, P()))


def shard_group_arrays(mesh: Mesh, group, axis_name: str = "shard"):
    """Shard a parametric factor group's stacked arrays across the factor
    axis (reference: remotecall of per-clique parametric solves → here the
    factor stack itself data-parallelises)."""
    def shard_leading(x, pad_zero=False):
        x = jnp.asarray(x)
        n = x.shape[0]
        per = mesh.devices.size
        pad = (-n) % per
        if pad:
            tail = (jnp.zeros_like(x[-1:]) if pad_zero else x[-1:])
            x = jnp.concatenate([x, jnp.repeat(tail, pad, axis=0)])
        return jax.device_put(
            x, NamedSharding(mesh, P(axis_name, *([None] * (x.ndim - 1)))))

    group.models = jax.tree.map(shard_leading, group.models)
    group.meas = shard_leading(group.meas)
    # zero whitening on padded rows → padded factors contribute nothing
    group.sqrt_inv = shard_leading(group.sqrt_inv, pad_zero=True)
    group.var_slots = shard_leading(group.var_slots)
    # null probabilities pad with zero (p=0 → gate always keeps; the
    # padded rows' zero whitening already cancels them)
    group.null_p = shard_leading(group.null_p, pad_zero=True)
    if group.hyp is not None:
        w, hyp_slots, upos = group.hyp
        group.hyp = (shard_leading(w), shard_leading(hyp_slots), upos)
    if group.mix is not None:
        w, mus, sqis = group.mix
        group.mix = (shard_leading(w), shard_leading(mus),
                     shard_leading(sqis, pad_zero=True))
    return group


def sharded_normal_equations(mesh: Mesh, residual_fn, x: jnp.ndarray,
                             axis_name: str = "shard"):
    """One GN normal-equation build with factor-sharded inputs: jit under the
    mesh — XLA/GSPMD partitions the vmapped residual/jacobian over factors
    and inserts the ICI psum for JᵀJ and Jᵀr automatically."""

    @jax.jit
    def neq(x):
        r = residual_fn(x)
        J = jax.jacfwd(residual_fn)(x)
        return J.T @ J, J.T @ r

    with mesh:
        return neq(x)
