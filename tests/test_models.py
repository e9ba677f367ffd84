"""Substitution and site model parity tests.

Golden numbers from the reference doctests:
  * Weibull rates vs R (site_model.hpp:84-99);
  * GTR eigenvalues vs R (substitution_model.hpp:124-130);
  * JC69 transition matrix entries (gp_engine.hpp:217-221).
"""

import jax.numpy as jnp
import numpy as np

from libsbn_tpu.ops import site_model, substitution


def test_weibull_rates_vs_r():
    rates, props = site_model.weibull_rates(1.0, 4)
    np.testing.assert_allclose(
        rates, [0.1457844, 0.5131316, 1.0708310, 2.2702530], atol=1e-4
    )
    rates2, _ = site_model.weibull_rates(0.1, 4)
    np.testing.assert_allclose(
        rates2, [4.766392e-12, 1.391131e-06, 2.179165e-03, 3.997819e00],
        rtol=1e-4,
    )
    np.testing.assert_allclose(props, 0.25)
    assert abs(float(jnp.dot(rates, props)) - 1.0) < 1e-4
    assert abs(float(jnp.dot(rates2, props)) - 1.0) < 1e-4


def test_weibull_rate_gradient_matches_ad():
    import jax

    K = 4
    jac = jax.jacobian(lambda s: site_model.weibull_rates(s, K)[0])(1.3)
    analytic = site_model.weibull_rate_gradient(1.3, K)
    np.testing.assert_allclose(jac, analytic, rtol=1e-10)


def test_gtr_default_matches_jc():
    _, _, _, evals_jc = substitution.jc69_eigen()
    _, _, _, evals_gtr = substitution.gtr_eigen(
        np.full(6, 1.0 / 6.0), np.full(4, 0.25)
    )
    np.testing.assert_allclose(sorted(np.asarray(evals_gtr)), sorted(np.asarray(evals_jc)), atol=1e-4)


def test_gtr_eigenvalues_vs_r():
    freqs = np.array([0.479367, 0.172572, 0.140933, 0.207128])
    rates = np.array([0.060602, 0.402732, 0.028230, 0.047910, 0.407249, 0.053277])
    _, evec, ivec, evals = substitution.gtr_eigen(rates, freqs)
    np.testing.assert_allclose(
        sorted(np.asarray(evals)),
        sorted([-2.567992e00, -1.760838e00, -4.214918e-01, 0.0]),
        atol=1e-4,
    )
    # Eigendecomposition reconstructs Q.
    Q = substitution.gtr_q(rates, freqs)
    np.testing.assert_allclose(
        jnp.einsum("ij,j,jk->ik", evec, evals, ivec), Q, atol=1e-12
    )
    # Detailed balance: pi_i Q_ij = pi_j Q_ji.
    piQ = freqs[:, None] * np.asarray(Q)
    np.testing.assert_allclose(piQ, piQ.T, atol=1e-12)


def test_jc69_transition_matrix():
    freqs, evec, ivec, evals = substitution.jc69_eigen()
    from libsbn_tpu.ops.pruning import node_transition_matrices

    P = node_transition_matrices(
        evec, ivec, evals, jnp.array([0.75]), jnp.ones(1)
    )[0, 0]
    # gp_engine.hpp:217-221 golden entries.
    assert abs(float(P[0, 0]) - 0.52590958087) < 1e-10
    assert abs(float(P[0, 1]) - 0.1580301397) < 1e-10
    # Rows sum to one.
    np.testing.assert_allclose(jnp.sum(P, axis=1), 1.0, atol=1e-12)
