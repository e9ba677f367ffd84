"""Constrained-parameter transforms.

Stick-breaking simplex transform in the Stan convention, matching
/root/reference/src/stick_breaking_transform.cpp (verified there against
PyTorch's StickBreakingTransform). Used to express GTR exchangeability rates
and stationary frequencies in unconstrained space; gradients in that space
come from JAX AD (the reference uses central finite differences,
fat_beagle.cpp:400-438).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stick_breaking(y):
    """Unconstrained y (K-1,) -> simplex x (K,)."""
    y = jnp.asarray(y)
    Km1 = y.shape[0]
    k = jnp.arange(Km1, dtype=y.dtype)
    z = jax.nn.sigmoid(y - jnp.log(Km1 - k))
    # x_k = z_k * prod_{j<k} (1 - z_j); remainder goes to the last entry.
    one_minus = jnp.concatenate([jnp.ones((1,), dtype=y.dtype), 1.0 - z])
    stick = jnp.cumprod(one_minus)  # stick[k] = prod_{j<k}(1-z_j), len K
    x = z * stick[:-1]
    return jnp.concatenate([x, stick[-1:]])


def stick_breaking_inverse(x):
    """Simplex x (K,) -> unconstrained y (K-1,)."""
    x = jnp.asarray(x)
    K = x.shape[0]
    k = jnp.arange(K - 1, dtype=x.dtype)
    remaining = 1.0 - jnp.concatenate(
        [jnp.zeros((1,), dtype=x.dtype), jnp.cumsum(x[:-1])]
    )[:-1]
    z = x[:-1] / remaining
    return jnp.log(z / (1.0 - z)) + jnp.log((K - 1) - k)


def stick_breaking_log_abs_det_jacobian(x, y):
    """log |det dx/dy| (stick_breaking_transform.cpp:46-59)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    Km1 = y.shape[0]
    k = jnp.arange(Km1, dtype=y.dtype)
    adj = y - jnp.log(Km1 - k)
    stick = 1.0 - jnp.concatenate(
        [jnp.zeros((1,), dtype=x.dtype), jnp.cumsum(x[:-1])]
    )[:-1]
    return jnp.sum(
        jnp.log(stick) - jax.nn.softplus(-adj) - jax.nn.softplus(adj)
    )
