"""Test configuration: force the CPU backend with 8 virtual devices.

Parity tests run in float64 on CPU (the reference's golden numbers are CPU
doubles); multi-chip sharding tests use the 8 virtual CPU devices, the JAX
way of testing distributed code without a pod (SURVEY.md §4).

NOTE: the axon TPU plugin ignores JAX_PLATFORMS env, so we must set the
platform through jax.config before any computation.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest

DATA = "/root/reference/data"


@pytest.fixture(scope="session")
def data_dir():
    return DATA
