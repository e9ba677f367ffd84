"""Substitution and site model parity tests.

Golden numbers from the reference doctests:
  * Weibull rates vs R (site_model.hpp:84-99);
  * GTR eigenvalues vs R (substitution_model.hpp:124-130);
  * JC69 transition matrix entries (gp_engine.hpp:217-221).
"""

import os
import jax.numpy as jnp
import numpy as np

from libsbn_tpu.ops import site_model, substitution

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


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
    np.testing.assert_allclose(
        sorted(np.asarray(evals_gtr)), sorted(np.asarray(evals_jc)), atol=1e-4
    )


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


def test_expm_transition_matches_eigen_form():
    """expm_transition == V e^{Lt} V^-1 at a generic GTR point, and its JVP
    matches AD-through-eigh there (where both are defined)."""
    import jax

    rates = jnp.array([0.05, 0.1, 0.15, 0.20, 0.25, 0.25])
    freqs = jnp.array([0.1, 0.2, 0.3, 0.4])
    ts = jnp.array([0.1, 0.5, 1.3])
    Q = substitution.gtr_q(rates, freqs)
    _, evec, ivec, evals = substitution.gtr_eigen(rates, freqs)
    P_ref = substitution.transition_matrices(evec, ivec, evals, ts)
    P = substitution.expm_transition(Q, freqs, ts)
    np.testing.assert_allclose(P, P_ref, atol=1e-12)

    def f_frechet(r):
        return jnp.sum(
            substitution.expm_transition(
                substitution.gtr_q(r, freqs), freqs, ts
            )
            ** 2
        )

    def f_eigh(r):
        fr, ev, iv, ei = substitution.gtr_eigen(r, freqs)
        return jnp.sum(substitution.transition_matrices(ev, iv, ei, ts) ** 2)

    g1 = jax.grad(f_frechet)(rates)
    g2 = jax.grad(f_eigh)(rates)
    np.testing.assert_allclose(g1, g2, atol=1e-8)


def test_gtr_gradient_at_repeated_eigenvalues():
    """Substitution gradients AT the uniform-rates point (JC-like Q, a
    triple eigenvalue) are finite and match central finite differences —
    the case AD-through-eigh cannot handle (documented failure; the
    reference sidesteps it with finite differences,
    /root/reference/src/fat_beagle.cpp:400-465)."""
    import jax

    from libsbn_tpu.core.site_pattern import SitePattern
    from libsbn_tpu.io import newick
    from libsbn_tpu.io.fasta import Alignment
    from libsbn_tpu.models.engine import LikelihoodEngine
    from libsbn_tpu.models.phylo_model import (
        PhyloModelSpec, default_parameters,
    )
    from libsbn_tpu.ops import schedule

    tops, bls, ttm = newick.parse_newick_file(
        f"{DATA}/hello.nwk"
    )
    sp = SitePattern(
        Alignment.read_fasta(f"{DATA}/hello.fasta"), ttm
    )
    spec = PhyloModelSpec("GTR", "constant", "strict")
    engine = LikelihoodEngine(sp, spec)
    sched = schedule.schedules_of_topologies(tops)
    bl = np.stack(bls)
    params = default_parameters(spec)  # uniform rates: repeated eigenvalues

    g = engine.phylo_gradients(sched, bl, params)
    gsub = np.asarray(g["substitution_model"])[0]
    assert np.all(np.isfinite(gsub)), gsub

    # Central finite differences in the same stick-breaking space.
    from libsbn_tpu.ops import transforms

    y0 = np.concatenate(
        [
            np.asarray(
                transforms.stick_breaking_inverse(
                    params["substitution"]["rates"]
                )
            ),
            np.asarray(
                transforms.stick_breaking_inverse(
                    params["substitution"]["frequencies"]
                )
            ),
        ]
    )

    def ll_of(y):
        p = {
            "substitution": {
                "rates": transforms.stick_breaking(jnp.asarray(y[:5])),
                "frequencies": transforms.stick_breaking(jnp.asarray(y[5:])),
            }
        }
        return float(engine.log_likelihoods(sched, bl, p)[0])

    eps = 1e-6
    for j in range(8):
        yp = y0.copy()
        yp[j] += eps
        ym = y0.copy()
        ym[j] -= eps
        fd = (ll_of(yp) - ll_of(ym)) / (2 * eps)
        assert abs(gsub[j] - fd) < 1e-4 * max(1.0, abs(fd)), (j, gsub[j], fd)
