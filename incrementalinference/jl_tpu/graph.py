"""Factor-graph container: variables, factors, solve keys.

Host-side data model replacing DistributedFactorGraphs.jl plus the
reference's graph-construction services (src/services/FactorGraph.jl).
Device data (particle beliefs, parametric means/covariances) are JAX arrays
hanging off the variables; all structure (labels, adjacency, solve keys) is
plain Python — the irregular part stays on host, the numeric part stays
fixed-shape for XLA (SURVEY.md §7.1).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .beliefs import Belief, make_belief
from .config import SolverParams
from .manifolds import Circle, Euclidean, Manifold

__all__ = [
    "VariableType", "Variable", "Factor", "FactorGraph", "initfg",
    "ContinuousScalar", "ContinuousEuclid", "Position", "Circular",
    "Position1", "Position2", "Position3", "Position4",
]


class VariableType:
    """A named manifold — the reference's `@defVariable` product
    (src/Variables/DefaultVariables.jl:9-52).

    Every instance registers in a weak set so session introspection
    (fgos.get_current_workspace_variables, the reference's
    getCurrentWorkspaceVariables) sees factory-created types too."""

    _REGISTRY = None  # lazily a weakref.WeakSet (class attr, shared)

    def __init__(self, name: str, manifold: Manifold):
        self.name = name
        self.manifold = manifold
        import weakref
        if VariableType._REGISTRY is None:
            VariableType._REGISTRY = weakref.WeakSet()
        VariableType._REGISTRY.add(self)

    def __repr__(self):
        return self.name

    def __eq__(self, other):
        return isinstance(other, VariableType) and \
            (self.name, self.manifold) == (other.name, other.manifold)

    def __hash__(self):
        return hash((self.name, self.manifold))


def ContinuousEuclid(n: int) -> VariableType:
    """Euclidean R^n variable type (reference ContinuousEuclid{N},
    src/Variables/DefaultVariables.jl:9-52)."""
    return VariableType(f"ContinuousEuclid{n}", Euclidean(n))


def Position(n: int) -> VariableType:
    """Translation-group position variable type (reference Position{N},
    src/Variables/DefaultVariables.jl:9-52)."""
    return VariableType(f"Position{n}", Euclidean(n))


ContinuousScalar = ContinuousEuclid(1)
Circular = VariableType("Circular", Circle())

# reference exports the first few Position{N} instances by name
# (src/Variables/DefaultVariables.jl / ExportAPI.jl Position1..Position4)
Position1 = Position(1)
Position2 = Position(2)
Position3 = Position(3)
Position4 = Position(4)

#: shared identity-point blocks keyed by (manifold, N) — see
#: Variable.default_points
_DEFAULT_POINTS_CACHE: Dict = {}


@dataclass
class Variable:
    """Graph variable with per-solveKey state (reference DFGVariable +
    VariableNodeData, src/services/FactorGraph.jl:380-511)."""

    label: str
    vartype: VariableType
    N: int = 100
    tags: set = field(default_factory=set)
    solvable: int = 1
    # wall-clock creation stamp + attached blob entries (reference DFG
    # getTimestamp / addData! data-entry API)
    timestamp: float = 0.0
    data: Dict[str, Any] = field(default_factory=dict)
    # per-solveKey particle beliefs (solveKey "default", snapshots, ...)
    beliefs: Dict[str, Belief] = field(default_factory=dict)
    initialized: Dict[str, bool] = field(default_factory=dict)
    ppe: Dict[str, dict] = field(default_factory=dict)
    # parametric solve state: tangent mean point + covariance
    parametric_point: Optional[jnp.ndarray] = None
    parametric_cov: Optional[jnp.ndarray] = None
    marginalized: bool = False
    # times each solveKey was written by a solver (reference VND solvedCount
    # / getSolvedCount / isSolved, DFG services)
    solved_count: Dict[str, int] = field(default_factory=dict)

    @property
    def manifold(self) -> Manifold:
        return self.vartype.manifold

    def get_solved_count(self, solve_key: str = "default") -> int:
        return self.solved_count.get(solve_key, 0)

    def is_solved(self, solve_key: str = "default") -> bool:
        return self.get_solved_count(solve_key) > 0

    def belief(self, solve_key: str = "default") -> Belief:
        return self.beliefs[solve_key]

    def is_initialized(self, solve_key: str = "default") -> bool:
        return self.initialized.get(solve_key, False)

    def default_points(self) -> jnp.ndarray:
        """N copies of the identity point (reference setDefaultNodeData!,
        FactorGraph.jl:453-511 allocates uninitialized points at identity).

        Cached per (manifold, N): jax arrays are immutable so every
        uninitialized variable can share one device buffer — the eager
        zeros/broadcast dispatches otherwise dominate graph construction
        (~3 device round-trips per variable on a tunneled TPU)."""
        key = (self.manifold, self.N)
        out = _DEFAULT_POINTS_CACHE.get(key)
        if out is None:
            ident = self.manifold.identity()
            out = jnp.broadcast_to(ident, (self.N,) + ident.shape).copy()
            _DEFAULT_POINTS_CACHE[key] = out
        return out


@dataclass
class Factor:
    """Graph factor: model + variable order + discrete-hypothesis config
    (reference DFGFactor + CommonConvWrapper metadata)."""

    label: str
    variables: Tuple[str, ...]
    model: Any                       # a models.FactorModel instance
    multihypo: Optional[Tuple[float, ...]] = None
    nullhypo: float = 0.0
    tags: set = field(default_factory=set)
    solvable: int = 1
    timestamp: float = 0.0
    # symbolic-elimination bookkeeping (reference GenericFunctionNodeData
    # .potentialused flag consumed by getFactorsAmongVariablesOnly)
    potential_used: bool = False
    # user-model per-factor cache built once at add time (reference
    # preambleCache hook, src/services/CalcFactor.jl cache plumbing)
    cache: Any = None

    @property
    def is_prior(self) -> bool:
        return len(self.variables) == 1 and getattr(self.model, "is_prior", False)

    @property
    def is_multihypo(self) -> bool:
        """Reference isMultihypo (src/services/FGOSUtils.jl:303-313)."""
        return self.multihypo is not None

    @property
    def is_partial(self) -> bool:
        """Reference isPartial (test/testPartialFactors.jl) — the factor
        constrains only a subset of the target's tangent dims."""
        return getattr(self.model, "partial", None) is not None


class FactorGraph:
    """The in-memory factor graph (reference ``initfg``/LocalDFG)."""

    def __init__(self, params: SolverParams | None = None):
        self.params = params or SolverParams()
        self.variables: Dict[str, Variable] = {}
        self.factors: Dict[str, Factor] = {}
        self._var_factors: Dict[str, List[str]] = {}
        self._seed = int(self.params.seed) & 0xFFFFFFFF
        self._key_ctr = 0
        self._factor_counter = itertools.count()
        self.solve_count = 0

    # -- RNG plumbing: host-side counter-derived threefry keys ------------
    def next_key(self):
        """Fresh PRNG key per call WITHOUT any eager device op — any (2,)
        uint32 array is a valid threefry key, so deriving (seed, counter)
        on host avoids the jax.random.split RPC per request (on a tunneled
        TPU each eager op costs a round trip; this was a per-clique-solve
        overhead).  Deterministic per (params.seed, call index)."""
        import numpy as _np
        self._key_ctr += 1
        return _np.array([self._seed, self._key_ctr], dtype=_np.uint32)

    def reseed(self, seed: int) -> None:
        """Restart the key stream from a new 32-bit seed."""
        self._seed = int(seed) & 0xFFFFFFFF
        self._key_ctr = 0

    # -- construction -----------------------------------------------------
    def add_variable(self, label: str, vartype: VariableType,
                     N: int | None = None, tags: Iterable[str] = (),
                     solvable: int = 1) -> Variable:
        """Add a variable node (reference addVariable!,
        src/services/FactorGraph.jl:587-632).  ``vartype`` fixes the
        manifold and point layout; ``N`` overrides ``SolverParams.N``
        particles for this variable's beliefs."""
        if label in self.variables:
            raise ValueError(f"variable {label!r} already exists")
        import time as _time
        v = Variable(label=label, vartype=vartype,
                     N=N or self.params.N, tags=set(tags), solvable=solvable,
                     timestamp=_time.time())
        self.variables[label] = v
        self._var_factors[label] = []
        # structural caches keyed by label tuples (e.g. the multihost joint
        # slot plan) may now be stale if this label was previously removed
        # and re-added with a different manifold/N
        self.__dict__.pop("_joint_plan_cache", None)
        return v

    def add_factor(self, variables: Sequence[str], model: Any,
                   multihypo: Optional[Sequence[float]] = None,
                   nullhypo: float = 0.0, label: str | None = None,
                   graphinit: bool | None = None, tags: Iterable[str] = (),
                   solvable: int = 1) -> Factor:
        """Add a factor over ``variables`` (reference addFactor!,
        src/services/FactorGraph.jl:824-902): auto-names the factor
        (assembleFactorName, :786-811), guards ``maxincidence``, parses
        ``multihypo``/``nullhypo`` (parseusermultihypo, :634-654), and
        triggers ``graphinit`` auto-initialization unless disabled."""
        variables = tuple(variables)
        for vl in variables:
            if vl not in self.variables:
                raise ValueError(f"unknown variable {vl!r}")
            if len(self._var_factors[vl]) >= self.params.max_incidence:
                raise ValueError(
                    f"variable {vl!r} exceeds maxincidence="
                    f"{self.params.max_incidence}")
        if multihypo is not None:
            multihypo = tuple(float(x) for x in multihypo)
            if len(multihypo) != len(variables):
                raise ValueError("multihypo length must match variables")
        if label is None:
            # reference assembleFactorName: join variable labels + "f<n>"
            label = "".join(variables) + f"f{next(self._factor_counter) + 1}"
        if label in self.factors:
            raise ValueError(f"factor {label!r} already exists")
        import time as _time
        f = Factor(label=label, variables=variables, model=model,
                   multihypo=multihypo, nullhypo=float(nullhypo),
                   tags=set(tags), solvable=solvable,
                   timestamp=_time.time())
        self.factors[label] = f
        for vl in variables:
            self._var_factors[vl].append(label)

        # reference preambleCache: a user model may build a one-time cache
        # from the graph context (CalcFactor.jl cache construction at CCW
        # creation); stored host-side on the factor
        pc = getattr(model, "preamble_cache", None)
        if callable(pc):
            f.cache = pc(self, [self.variables[vl] for vl in variables], f)

        do_init = self.params.graphinit if graphinit is None else graphinit
        if do_init:
            from .graphinit import doautoinit
            for vl in variables:
                doautoinit(self, vl)
        return f

    def remove_factor(self, label: str) -> Factor:
        """Delete a factor (reference DFG deleteFactor!)."""
        f = self.factors.pop(label, None)
        if f is None:
            raise KeyError(f"unknown factor {label!r}")
        for vl in f.variables:
            if label in self._var_factors.get(vl, ()):
                self._var_factors[vl].remove(label)
        return f

    def remove_variable(self, label: str, remove_factors: bool = True
                        ) -> Variable:
        """Delete a variable (reference DFG deleteVariable!).  Connected
        factors are removed too unless ``remove_factors=False`` (then the
        delete refuses while factors remain)."""
        if label not in self.variables:
            raise KeyError(f"unknown variable {label!r}")
        attached = list(self._var_factors.get(label, ()))
        if attached and not remove_factors:
            raise ValueError(
                f"variable {label!r} still has factors {attached}")
        for fl in attached:
            self.remove_factor(fl)
        self._var_factors.pop(label, None)
        self.__dict__.pop("_joint_plan_cache", None)
        return self.variables.pop(label)

    # -- queries (reference ls/lsf/getNeighbors) --------------------------
    def exists(self, label: str) -> bool:
        """Reference DFG exists(fg, label) — variable or factor."""
        return label in self.variables or label in self.factors

    def ls(self, tags: Iterable[str] = ()) -> List[str]:
        """Variable labels, optionally filtered by tags (reference
        ls(dfg))."""
        tags = set(tags)
        return [v for v, var in self.variables.items()
                if not tags or tags & var.tags]

    def lsf(self, tags: Iterable[str] = ()) -> List[str]:
        """Factor labels, optionally filtered by tags (reference
        lsf(dfg))."""
        tags = set(tags)
        return [f for f, fac in self.factors.items()
                if not tags or tags & fac.tags]

    def var(self, label: str) -> Variable:
        """The ``Variable`` node (reference getVariable)."""
        return self.variables[label]

    def factor(self, label: str) -> Factor:
        """The ``Factor`` node (reference getFactor)."""
        return self.factors[label]

    def factors_of(self, var_label: str) -> List[str]:
        """Labels of factors attached to a variable (reference
        ls(dfg, sym) neighbor listing)."""
        return list(self._var_factors[var_label])

    def neighbors(self, label: str) -> List[str]:
        """Graph neighbors of a variable (its factors) or factor (its
        variables) — reference getNeighbors."""
        if label in self.variables:
            return self.factors_of(label)
        return list(self.factors[label].variables)

    # -- belief get/set (reference getBelief / setValKDE!) ----------------
    def get_belief(self, label: str, solve_key: str = "default") -> Belief:
        """The variable's ``Belief`` under a solveKey (reference
        getBelief, src/services/FactorGraph.jl)."""
        return self.variables[label].beliefs[solve_key]

    def set_belief(self, label: str, points: jnp.ndarray,
                   solve_key: str = "default",
                   bw: jnp.ndarray | None = None,
                   ipc: jnp.ndarray | None = None,
                   initialized: bool = True) -> Belief:
        """Replace the variable's belief with a particle set (reference
        setValKDE!/setBelief!, src/services/FactorGraph.jl:158-297):
        bandwidths are LOO-selected when ``bw`` is omitted, and the
        per-solveKey ``initialized`` flag is set."""
        v = self.variables[label]
        b = make_belief(v.manifold, points, bw=bw, ipc=ipc)
        v.beliefs[solve_key] = b
        v.initialized[solve_key] = initialized
        return b

    def points(self, label: str, solve_key: str = "default") -> jnp.ndarray:
        """The belief's particle array ``(N, point_dim)`` (reference
        getVal); identity points when the solveKey has no belief yet."""
        v = self.variables[label]
        b = v.beliefs.get(solve_key)
        return v.default_points() if b is None else b.points

    # -- misc -------------------------------------------------------------
    def __repr__(self):
        return (f"FactorGraph({len(self.variables)} variables, "
                f"{len(self.factors)} factors)")


def initfg(params: SolverParams | None = None) -> FactorGraph:
    """Reference ``initfg`` (src/services/FactorGraph.jl:7-42)."""
    return FactorGraph(params)
