"""libsbn_tpu: a TPU-native phylogenetic variational inference framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
phylovi/libsbn (subsplit Bayes networks, variational Bayesian phylogenetic
inference, generalized pruning), designed TPU-first:

  * tree topologies compile to dense index schedules; likelihoods and
    gradients run as batched, jitted Felsenstein pruning over device-resident
    partial likelihood vectors;
  * thousands of trees evaluate per kernel launch via vmap/pjit instead of
    the reference's one-thread-per-tree model;
  * multi-chip scaling uses jax.sharding meshes with XLA collectives.

Double precision is enabled at import because the parity targets of the
reference demand 1e-6..1e-12 agreement; TPU benchmark paths explicitly cast
to float32/bfloat16.
"""

import os as _os

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)

# TPU MXU default is bf16-multiply for f32 matmuls; that loses ~1% of the
# log-likelihood (96 LL units on DS1 — fails the pybeagle parity gate, see
# docs/parity_map.md precision policy). Every einsum/dot in the likelihood,
# gradient, GP, and VI paths therefore runs at full-f32 matmul precision by
# default. Override with LIBSBN_TPU_MATMUL_PRECISION=default|high|highest.
_jax_config.update(
    "jax_default_matmul_precision",
    _os.environ.get("LIBSBN_TPU_MATMUL_PRECISION", "highest"),
)

# Persistent XLA compilation cache: deep subsplit-DAG programs can take
# minutes of compile on TPU; cache them across processes. Opt out with
# LIBSBN_TPU_NO_CACHE=1 or redirect with LIBSBN_TPU_CACHE_DIR.
if not _os.environ.get("LIBSBN_TPU_NO_CACHE"):
    _cache_dir = _os.environ.get(
        "LIBSBN_TPU_CACHE_DIR",
        _os.path.join(
            _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
            "libsbn_tpu_xla",
        ),
    )
    try:
        _jax_config.update("jax_compilation_cache_dir", _cache_dir)
        # Only cache the expensive programs (deep GP DAGs, big training
        # steps): caching every small CPU test program churns disk and
        # XLA:CPU AOT reloads warn about machine-feature mismatches.
        _jax_config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass

__version__ = "0.1.0"

from .instance import RootedInstance, UnrootedInstance  # noqa: E402
from .instance.rooted import ratio_gradient_of_height_gradient  # noqa: E402
from .gp.instance import GPInstance  # noqa: E402
from .models.phylo_model import PhyloModelSpec  # noqa: E402
from .core.tree import (  # noqa: E402
    RootedTree,
    RootedTreeCollection,
    UnrootedTree,
    UnrootedTreeCollection,
)
from .sbn.support import PSPIndexer  # noqa: E402

# Reference-exact module names (pylibsbn.cpp:177,269,383,130): a pylibsbn
# user's `libsbn.unrooted_instance(...)` / `libsbn.PhyloModelSpecification(
# substitution=..., site=..., clock=...)` works verbatim against this
# package (PhyloModelSpec is a dataclass with the same three fields in the
# same positional order).
rooted_instance = RootedInstance
unrooted_instance = UnrootedInstance
gp_instance = GPInstance
PhyloModelSpecification = PhyloModelSpec

__all__ = [
    "RootedInstance",
    "UnrootedInstance",
    "GPInstance",
    "PhyloModelSpec",
    "PhyloModelSpecification",
    "rooted_instance",
    "unrooted_instance",
    "gp_instance",
    "RootedTree",
    "RootedTreeCollection",
    "UnrootedTree",
    "UnrootedTreeCollection",
    "PSPIndexer",
    "ratio_gradient_of_height_gradient",
    "__version__",
]
