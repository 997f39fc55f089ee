"""Neural-network-ensemble measurement models.

Reference: ext/IncrInfrFluxFactorsExt.jl (FluxModelsDistribution :30-60,
MixtureFluxModels).  The reference wraps Flux.jl model vectors; here the
ensemble is a stacked-parameter pure-JAX function — one `vmap` over the
ensemble axis replaces the per-model loop, and sampling picks a model index
per draw.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

from ..distributions import Distribution
from .factors import Mixture

__all__ = ["FluxModelsDistribution", "MixtureFluxModels", "SequentialNet",
           "mlp_init", "mlp_apply", "nn_init"]


def mlp_init(key, sizes: Sequence[int], n_models: int = 1):
    """Stacked-ensemble MLP parameters: list of (W (E, out, in), b (E, out))."""
    params = []
    for a, b in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        params.append((jax.random.normal(k1, (n_models, b, a)) /
                       jnp.sqrt(a), 0.01 * jax.random.normal(k2, (n_models, b))))
    return params


def mlp_apply(params, x):
    """Forward one MLP (single-model slice of the stack): x (in,) → (out,)."""
    for i, (W, b) in enumerate(params):
        x = W @ x + b
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


class SequentialNet:
    """Arbitrary sequential network from a declarative layer spec — the
    general-NN analogue of the reference's serialized Flux model chains
    (ext/FluxModelsSerialization.jl: arbitrary `Chain` architectures
    round-trip by structure, not by a registered Julia function name).

    ``spec`` is a tuple of layer descriptors:

    - ``("dense", in, out)`` — affine layer, 1-D activations
    - ``("conv2d", cin, cout, k)`` — SAME-padded k×k conv on (H, W, C)
    - ``("maxpool2d", k)`` / ``("avgpool2d", k)`` — k×k stride-k pooling
    - ``("flatten",)`` — reshape to 1-D
    - ``("relu",)`` ``("tanh",)`` ``("sigmoid",)`` ``("softmax",)``

    Instances hash/compare by spec, so a loaded graph reuses the jit cache
    of the saved one; the spec itself is JSON-serializable, so NO function
    registry is needed for these models (serialization/packed.py).
    """

    _PARAM_LAYERS = ("dense", "conv2d")

    def __init__(self, spec: Sequence[Sequence]):
        self.spec = tuple(tuple(l) for l in spec)

    def __call__(self, params, x):
        i = 0
        for layer in self.spec:
            kind = layer[0]
            if kind == "dense":
                W, b = params[i]
                i += 1
                x = W @ x + b
            elif kind == "conv2d":
                W, b = params[i]
                i += 1
                x = jax.lax.conv_general_dilated(
                    x[None], W, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))[0] + b
            elif kind in ("maxpool2d", "avgpool2d"):
                k = int(layer[1])
                if kind == "maxpool2d":
                    x = jax.lax.reduce_window(
                        x, -jnp.inf, jax.lax.max, (k, k, 1), (k, k, 1),
                        "VALID")
                else:
                    x = jax.lax.reduce_window(
                        x, 0.0, jax.lax.add, (k, k, 1), (k, k, 1),
                        "VALID") / float(k * k)
            elif kind == "flatten":
                x = x.reshape(-1)
            elif kind == "relu":
                x = jax.nn.relu(x)
            elif kind == "tanh":
                x = jnp.tanh(x)
            elif kind == "sigmoid":
                x = jax.nn.sigmoid(x)
            elif kind == "softmax":
                x = jax.nn.softmax(x)
            else:
                raise ValueError(f"unknown layer kind {kind!r}")
        return x

    def __hash__(self):
        return hash(self.spec)

    def __eq__(self, other):
        return isinstance(other, SequentialNet) and self.spec == other.spec

    def __repr__(self):
        return f"SequentialNet({list(self.spec)})"


def nn_init(key, spec, n_models: int = 1):
    """Stacked-ensemble parameters for a :class:`SequentialNet` spec:
    one leading ensemble axis per parameterized layer."""
    params = []
    for layer in spec:
        kind = layer[0]
        if kind == "dense":
            _, a, b = layer
            key, k1, k2 = jax.random.split(key, 3)
            params.append((jax.random.normal(k1, (n_models, b, a)) /
                           jnp.sqrt(a),
                           0.01 * jax.random.normal(k2, (n_models, b))))
        elif kind == "conv2d":
            _, cin, cout, k = layer
            key, k1, k2 = jax.random.split(key, 3)
            params.append((jax.random.normal(k1, (n_models, k, k, cin,
                                                  cout)) /
                           jnp.sqrt(k * k * cin),
                           0.01 * jax.random.normal(k2, (n_models, cout))))
    return params


class FluxModelsDistribution(Distribution):
    """Ensemble-of-networks distribution: a draw picks one ensemble member
    and runs it on ``data`` (reference FluxModelsDistribution fields models/
    inputDim/outputDim/data/shuffle)."""

    def __init__(self, apply_fn: Callable, params, data: jnp.ndarray,
                 out_dim: int, shuffle: bool = True):
        self.apply_fn = apply_fn          # (single-model params, data) -> (out,)
        self.params = params              # pytree with leading ensemble axis
        self.data = jnp.asarray(data)
        self.out_dim = int(out_dim)
        self.shuffle = shuffle

    @property
    def dim(self):
        return self.out_dim

    def _n_models(self):
        leaf = jax.tree.leaves(self.params)[0]
        return leaf.shape[0]

    def _all_outputs(self):
        return jax.vmap(lambda p: self.apply_fn(p, self.data))(self.params)

    def sample(self, key, n):
        outs = self._all_outputs()                       # (E, out)
        e = self._n_models()
        if self.shuffle:
            idx = jax.random.randint(key, (n,), 0, e)
        else:
            idx = jnp.arange(n) % e
        return outs[idx]

    def logpdf(self, x):
        outs = self._all_outputs()
        d = x[..., None, :] - outs[None, :, :]
        s2 = jnp.maximum(jnp.var(outs, axis=0).mean(), 1e-6)
        logk = -0.5 * jnp.sum(d * d, axis=-1) / s2
        return jax.scipy.special.logsumexp(logk, axis=-1) - jnp.log(
            float(outs.shape[0]))

    def mean_cov(self):
        outs = self._all_outputs()
        mu = jnp.mean(outs, axis=0)
        d = outs - mu
        cov = (d.T @ d) / max(outs.shape[0] - 1, 1) + \
            1e-6 * jnp.eye(self.out_dim)
        return mu, cov


def MixtureFluxModels(mechanics, flux_dist: FluxModelsDistribution,
                      other_components: Sequence[Distribution],
                      diversity: Sequence[float]) -> Mixture:
    """NN-ensemble component mixed with analytic components (reference
    MixtureFluxModels, ext/IncrInfrFluxFactorsExt.jl)."""
    return Mixture(mechanics, [flux_dist, *other_components], diversity)


jax.tree_util.register_pytree_node(
    FluxModelsDistribution,
    lambda f: ((f.params, f.data), (f.apply_fn, f.out_dim, f.shuffle)),
    lambda aux, ch: _unflatten_flux(aux, ch))


def _unflatten_flux(aux, ch):
    f = object.__new__(FluxModelsDistribution)
    f.params, f.data = ch
    f.apply_fn, f.out_dim, f.shuffle = aux
    return f
