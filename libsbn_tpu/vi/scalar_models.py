"""Scalar variational models (reference: vip/scalar_model.py).

The reference hand-derives reparameterization gradients (eq:gLogNorm,
eq:dgdPsi, eq:dlogqgdPsi) for a log-normal q and wraps TFP distributions for
the rest. Here the log-normal model is JAX-native; the analytic gradient
formulas are retained (they're one-liners) and verified against AD in tests.

Gradient conventions returned by sample_and_gradients (matching the
reference so BranchModel.scalar_grad composes identically):
  * sample: (P, B) sampled branch lengths;
  * dg_dpsi: (P, V, 2) gradient of the reparameterization g wrt (mu, sigma);
  * dlog_qg_dpsi: (P, V, 2) TOTAL derivative of log q(g(eps, psi); psi).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class ScalarModel:
    def __init__(self, initial_params: np.ndarray, variable_count: int):
        initial_params = np.asarray(initial_params, dtype=np.float64)
        assert initial_params.ndim == 1
        self.q_params = np.full((variable_count, len(initial_params)), initial_params)

    @property
    def variable_count(self) -> int:
        return self.q_params.shape[0]

    @property
    def param_count(self) -> int:
        return self.q_params.shape[1]

    def suggested_step_size(self):
        return np.average(np.abs(self.q_params), axis=0) / 100


class LogNormalModel(ScalarModel):
    """Log-normal q with analytic reparameterization gradients."""

    def __init__(self, variable_count: int, rng=None):
        super().__init__(np.array([-2.0, 0.5]), variable_count)
        self.name = "LogNormal"
        self.rng = rng or np.random.default_rng(0)

    def mu(self, which_variables=None):
        if which_variables is None:
            return self.q_params[:, 0]
        return self.q_params[which_variables, 0]

    def sigma(self, which_variables=None):
        if which_variables is None:
            return self.q_params[:, 1]
        return self.q_params[which_variables, 1]

    def mode_match(self, modes):
        """Initialize so the lognormal modes match (scalar_model.py:95-101)."""
        modes = np.asarray(modes)
        log_modes = np.log(np.clip(modes, 1e-6, None))
        biclipped = np.log(np.clip(modes, 1e-6, 1 - 1e-6))
        self.q_params[:, 1] = -0.1 * biclipped
        self.q_params[:, 0] = np.square(self.q_params[:, 1]) + log_modes

    def sample_all(self, particle_count: int):
        return self.rng.lognormal(
            self.mu(), self.sigma(), (particle_count, self.variable_count)
        )

    def sample(self, px_which_variables):
        px_which_variables = np.asarray(px_which_variables)
        mu = self.q_params[px_which_variables, 0]
        sigma = self.q_params[px_which_variables, 1]
        return self.rng.lognormal(mu, sigma)

    def sample_and_gradients(self, px_which_variables, prebaked_sample=None):
        """(sample, dg_dpsi, dlog_qg_dpsi); see module docstring."""
        px_which_variables = np.asarray(px_which_variables)
        particle_count, width = px_which_variables.shape
        mu = self.q_params[px_which_variables, 0]  # (P, B)
        sigma = self.q_params[px_which_variables, 1]
        if prebaked_sample is None:
            sample = self.rng.lognormal(mu, sigma)
        else:
            sample = np.broadcast_to(prebaked_sample, (particle_count, width)).copy()
        dg_dpsi = np.zeros((particle_count, self.variable_count, 2))
        dlog_qg_dpsi = np.zeros((particle_count, self.variable_count, 2))
        dlog_qg_dpsi[:, :, 0] = -1.0  # eq:dlogqgdPsi
        epsilon = (np.log(sample) - mu) / sigma  # eq:gLogNorm
        rows = np.arange(particle_count)[:, None]
        # eq:dgdPsi — note: assumes each variable appears at most once per
        # particle (true for split/PSP representations).
        dg_dpsi[rows, px_which_variables, 0] = sample
        dg_dpsi[rows, px_which_variables, 1] = sample * epsilon
        dlog_qg_dpsi[rows, px_which_variables, 1] = -epsilon - 1.0 / sigma
        return sample, dg_dpsi, dlog_qg_dpsi

    @staticmethod
    def general_log_prob(values, mu, sigma):
        log_values = np.log(values)
        ratio = (log_values - mu) ** 2 / (2 * sigma**2)
        return -(
            np.sum(log_values)
            + np.sum(np.log(sigma))
            + values.size * 0.5 * np.log(2 * np.pi)
            + np.sum(ratio)
        )

    def log_prob(self, values, which_variables):
        values = np.asarray(values)
        assert values.size == np.asarray(which_variables).size
        return LogNormalModel.general_log_prob(
            values, self.mu(which_variables), self.sigma(which_variables)
        )


def of_name(name: str, variable_count: int, rng=None) -> ScalarModel:
    if name == "lognormal":
        return LogNormalModel(variable_count, rng)
    raise ValueError(f"Scalar model {name} not known.")
