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

from jax import config as _jax_config

_jax_config.update("jax_enable_x64", True)

__version__ = "0.1.0"

from .instance import RootedInstance, UnrootedInstance  # noqa: E402

__all__ = ["RootedInstance", "UnrootedInstance", "__version__"]
