"""Site rate-variation models (constant, discretized Weibull).

Reference semantics: /root/reference/src/site_model.cpp — the Weibull
median-discretization (Yang 1994 style) with scale fixed to 1 and rates
normalized to mean 1. Implemented as a pure JAX function of the shape
parameter, so the site-model gradient comes from AD instead of the
reference's hand-derived rate_derivatives_ chain.
"""

from __future__ import annotations

import jax.numpy as jnp


def constant_rates(dtype=jnp.float64):
    return jnp.ones((1,), dtype=dtype), jnp.ones((1,), dtype=dtype)


def weibull_rates(shape, category_count: int, dtype=jnp.float64):
    """Discretized Weibull category rates and proportions.

    rate_i ∝ (-log(1 - (2i+1)/(2K)))^(1/shape), normalized to mean 1;
    proportions are uniform (site_model.cpp UpdateRates)."""
    i = jnp.arange(category_count, dtype=dtype)
    quantile = (2.0 * i + 1.0) / (2.0 * category_count)
    raw = jnp.power(-jnp.log1p(-quantile), 1.0 / shape)
    rates = raw / jnp.mean(raw)
    props = jnp.full((category_count,), 1.0 / category_count, dtype=dtype)
    return rates, props


def weibull_rate_gradient(shape, category_count: int, dtype=jnp.float64):
    """Analytic d(rates)/d(shape), matching site_model.cpp for parity tests.
    (Production gradients flow through AD of weibull_rates.)"""
    i = jnp.arange(category_count, dtype=dtype)
    quantile = (2.0 * i + 1.0) / (2.0 * category_count)
    base = -jnp.log1p(-quantile)
    raw = jnp.power(base, 1.0 / shape)
    draw = -raw * jnp.log(base) / (shape * shape)
    mean = jnp.mean(raw)
    dmean = jnp.mean(draw)
    return (draw * mean - raw * dmean) / (mean * mean)
