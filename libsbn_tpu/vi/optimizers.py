"""Optimizers for VBPI (reference: vip/optimizers.py, vip/sgd_server.py).

The SGD server keeps dict-keyed state for the two parameter groups
(scalar q-params and SBN params) with separate step sizes; SimpleOptimizer
decays the step size, BumpStepsizeOptimizer grows it until the windowed ELBO
drops, then restores the best parameters and decays.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np


class SGDServer:
    """Dict-keyed first-order optimizer bank (vip/sgd_server.py)."""

    def __init__(
        self, dim_dict: Dict[str, tuple], beta_0=0.9, beta_1=0.999,
        beta_1_ams=0.99, gamma=0.9, epsilon=1e-8, decay=0.0, momentum=0.9,
    ):
        self.beta_0, self.beta_1 = beta_0, beta_1
        self.beta_1_ams = beta_1_ams
        self.gamma = gamma
        self.mom = momentum
        self.decay = decay
        self.eps = epsilon
        self.vars = list(dim_dict.keys())
        self.mean_grad = {v: np.zeros(d) for v, d in dim_dict.items()}
        self.var_grad = {v: np.zeros(d) for v, d in dim_dict.items()}
        self.var_delta = {v: np.zeros(d) for v, d in dim_dict.items()}
        self.var_grad_max = {v: np.zeros(d) for v, d in dim_dict.items()}
        self.t = 0

    def sgd(self, stepsz, params, grads):
        for v in self.vars:
            g = grads[v] - self.decay * params[v]
            self.mean_grad[v] = self.mom * self.mean_grad[v] + stepsz[v] * g
        return self.mean_grad

    def adam(self, stepsz, params, grads):
        self.t += 1
        out = {}
        for v in self.vars:
            g = grads[v] - self.decay * params[v]
            self.mean_grad[v] = self.beta_0 * self.mean_grad[v] + (1 - self.beta_0) * g
            self.var_grad[v] = self.beta_1 * self.var_grad[v] + (1 - self.beta_1) * g**2
            m_hat = self.mean_grad[v] / (1 - self.beta_0**self.t)
            v_hat = self.var_grad[v] / (1 - self.beta_1**self.t)
            out[v] = stepsz[v] * m_hat / (np.sqrt(v_hat) + self.eps)
        return out

    def amsgrad(self, stepsz, params, grads):
        self.t += 1
        out = {}
        for v in self.vars:
            g = grads[v] - self.decay * params[v]
            self.mean_grad[v] = self.beta_0 * self.mean_grad[v] + (1 - self.beta_0) * g
            self.var_grad[v] = (
                self.beta_1_ams * self.var_grad[v] + (1 - self.beta_1_ams) * g**2
            )
            self.var_grad_max[v] = np.maximum(self.var_grad_max[v], self.var_grad[v])
            m_hat = self.mean_grad[v] / (1 - self.beta_0**self.t)
            v_hat = self.var_grad_max[v] / (1 - self.beta_1_ams**self.t)
            out[v] = stepsz[v] * m_hat / (np.sqrt(v_hat) + self.eps)
        return out

    def rmsprop(self, stepsz, params, grads):
        out = {}
        for v in self.vars:
            g = grads[v] - self.decay * params[v]
            self.var_grad[v] = self.gamma * self.var_grad[v] + (1 - self.gamma) * g**2
            out[v] = stepsz[v] * g / np.sqrt(self.var_grad[v] + self.eps)
        return out

    def adagrad(self, stepsz, params, grads):
        out = {}
        for v in self.vars:
            g = grads[v] - self.decay * params[v]
            self.var_grad[v] = self.var_grad[v] + g**2
            out[v] = stepsz[v] * g / np.sqrt(self.var_grad[v] + self.eps)
        return out

    def adadelta(self, stepsz, params, grads):
        out = {}
        for v in self.vars:
            g = grads[v] - self.decay * params[v]
            self.var_grad[v] = self.gamma * self.var_grad[v] + (1 - self.gamma) * g**2
            out[v] = (
                np.sqrt((self.var_delta[v] + self.eps) / (self.var_grad[v] + self.eps))
                * g
            )
            self.var_delta[v] = (
                self.gamma * self.var_delta[v] + (1 - self.gamma) * out[v] ** 2
            )
        return out


class BaseOptimizer:
    def __init__(self, inst, scalar_model, elbo_estimator_fn: Callable):
        self.inst = inst
        self.scalar_model = scalar_model
        self.estimate_elbo = elbo_estimator_fn
        self.trace = []
        self.step_number = 0
        self.step_size = scalar_model.suggested_step_size()
        self.sbn_step_size = 0.001
        self.sgd_server = SGDServer(
            {
                "scalar_params": scalar_model.q_params.shape,
                "sbn_params": np.asarray(inst.sbn_parameters).shape,
            }
        )

    def _simple_gradient_step(self, grad_dict) -> bool:
        scalar_grad = grad_dict["scalar_params"]
        sbn_grad = grad_dict["sbn_params"]
        assert self.scalar_model.q_params.shape == scalar_grad.shape
        if not np.isfinite(scalar_grad).all():
            return False
        update = self.sgd_server.adam(
            {"scalar_params": self.step_size, "sbn_params": self.sbn_step_size},
            {
                "scalar_params": self.scalar_model.q_params,
                "sbn_params": self.inst.sbn_parameters,
            },
            grad_dict,
        )
        self.scalar_model.q_params += update["scalar_params"]
        self.inst.sbn_parameters = self.inst.sbn_parameters + update["sbn_params"]
        return True

    def gradient_step(self, grad_dict):
        ok = self._simple_gradient_step(grad_dict)
        self.update(ok)

    def update(self, gradient_step_was_successful: bool):
        raise NotImplementedError


class SimpleOptimizer(BaseOptimizer):
    def __init__(self, inst, scalar_model, elbo_estimator_fn):
        super().__init__(inst, scalar_model, elbo_estimator_fn)
        self.stepsize_decreasing_rate = 1 - 1e-2

    def update(self, ok: bool):
        if ok:
            self.step_size *= self.stepsize_decreasing_rate
        else:
            self.step_size /= 2
        self.step_number += 1


class BumpStepsizeOptimizer(BaseOptimizer):
    """Increase the stepsize until the windowed ELBO drops, then restore the
    best parameters and decay (optimizers.py:83-127)."""

    def __init__(self, inst, scalar_model, elbo_estimator_fn):
        super().__init__(inst, scalar_model, elbo_estimator_fn)
        self.window_size = 5
        self.stepsize_increasing_rate = 1.2
        self.stepsize_decreasing_rate = 1 - 1e-2
        self.stepsize_drop_from_peak = 4
        self.stepsize_increasing = True
        self.best_elbo = -np.inf
        self.best_q_params = np.zeros(scalar_model.q_params.shape)

    def _turn_around(self):
        np.copyto(self.scalar_model.q_params, self.best_q_params)
        self.step_size /= self.stepsize_drop_from_peak
        self.stepsize_increasing = False

    def update(self, ok: bool):
        if not ok:
            self._turn_around()
        if self.stepsize_increasing and self.step_number >= 2 * self.window_size:
            last = self.trace[-self.window_size :]
            prev = self.trace[-2 * self.window_size : -self.window_size]
            if np.mean(last) < np.mean(prev):
                self._turn_around()
        if self.stepsize_increasing:
            self.step_size *= self.stepsize_increasing_rate
        else:
            self.step_size *= self.stepsize_decreasing_rate
        self.trace.append(self.estimate_elbo(particle_count=500))
        if self.trace[-1] > self.best_elbo:
            self.best_elbo = self.trace[-1]
            np.copyto(self.best_q_params, self.scalar_model.q_params)
        self.step_number += 1
        return np.isfinite(self.trace[-1])


def of_name(name: str, inst, scalar_model, elbo_estimator_fn) -> BaseOptimizer:
    choices = {"simple": SimpleOptimizer, "bump": BumpStepsizeOptimizer}
    if name not in choices:
        raise ValueError(f"Optimizer {name} not known.")
    return choices[name](inst, scalar_model, elbo_estimator_fn)
