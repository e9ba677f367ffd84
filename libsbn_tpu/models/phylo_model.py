"""Phylogenetic model composition: substitution x site x clock.

Reference: /root/reference/src/phylo_model.{hpp,cpp} — a model is specified
by a string triple, e.g. {"JC69"|"GTR", "constant"|"weibull+K",
"none"|"strict"}. Parameters are JAX pytrees (the idiomatic replacement for
BlockModel's flat segments); a BlockSpecification is still provided for the
reference's flat-vector API.

``model_tensors(spec, params)`` lowers a parameter pytree to the dense
tensors the pruning kernels consume: (freqs, evec, ivec, evals, rates,
props, Q). Everything is differentiable, so model gradients are plain AD.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..ops import site_model as site_ops
from ..ops import substitution as subst_ops
from .block_specification import BlockSpecification


@dataclass(frozen=True)
class PhyloModelSpec:
    substitution: str = "JC69"
    site: str = "constant"
    clock: str = "strict"

    def site_category_count(self) -> int:
        if self.site == "constant":
            return 1
        if self.site.startswith("weibull"):
            if "+" in self.site:
                return int(self.site.split("+")[1])
            return 4
        raise ValueError(f"Site model not known: {self.site}")


# Block keys matching the reference's strings.
GTR_RATES_KEY = "GTR rates"
FREQUENCIES_KEY = "frequencies"
WEIBULL_SHAPE_KEY = "Weibull shape"
CLOCK_RATE_KEY = "clock rate"
ENTIRE_SUBSTITUTION = "entire substitution"
ENTIRE_SITE = "entire site"
ENTIRE_CLOCK = "entire clock"


def default_parameters(spec: PhyloModelSpec) -> Dict:
    """The default parameter pytree for a model specification."""
    params: Dict = {}
    if spec.substitution == "GTR":
        params["substitution"] = {
            "rates": jnp.asarray(np.full(6, 1.0 / 6.0)),
            "frequencies": jnp.asarray(np.full(4, 0.25)),
        }
    elif spec.substitution != "JC69":
        raise ValueError(f"Substitution model not known: {spec.substitution}")
    if spec.site.startswith("weibull"):
        params["site"] = {"shape": jnp.asarray(1.0)}
    elif spec.site != "constant":
        raise ValueError(f"Site model not known: {spec.site}")
    if spec.clock == "strict":
        params["clock"] = {"rate": jnp.asarray(1.0)}
    elif spec.clock != "none":
        raise ValueError(f"Clock model not known: {spec.clock}")
    return params


def block_specification(spec: PhyloModelSpec) -> BlockSpecification:
    """Flat-vector layout mirroring PhyloModel::PhyloModel composition
    (phylo_model.cpp): substitution blocks, then site, then clock, with
    "entire <submodel>" spans."""
    subst = BlockSpecification(
        [(GTR_RATES_KEY, 6), (FREQUENCIES_KEY, 4)]
        if spec.substitution == "GTR"
        else []
    )
    site = BlockSpecification(
        [(WEIBULL_SHAPE_KEY, 1)] if spec.site.startswith("weibull") else []
    )
    clock = BlockSpecification(
        [(CLOCK_RATE_KEY, 1)] if spec.clock == "strict" else []
    )
    out = BlockSpecification([])
    out.append(ENTIRE_SUBSTITUTION, subst)
    out.append(ENTIRE_SITE, site)
    out.append(ENTIRE_CLOCK, clock)
    return out


def parameters_from_flat(spec: PhyloModelSpec, v) -> Dict:
    """Flat parameter vector -> pytree (SetParameters analog)."""
    bs = block_specification(spec)
    bs.check_parameter_vector_size(v)
    params: Dict = {}
    if spec.substitution == "GTR":
        params["substitution"] = {
            "rates": jnp.asarray(bs.extract_segment(v, GTR_RATES_KEY)),
            "frequencies": jnp.asarray(bs.extract_segment(v, FREQUENCIES_KEY)),
        }
    if spec.site.startswith("weibull"):
        params["site"] = {
            "shape": jnp.asarray(bs.extract_segment(v, WEIBULL_SHAPE_KEY)[0])
        }
    if spec.clock == "strict":
        params["clock"] = {
            "rate": jnp.asarray(bs.extract_segment(v, CLOCK_RATE_KEY)[0])
        }
    return params


def flat_from_parameters(spec: PhyloModelSpec, params: Dict) -> np.ndarray:
    """Parameter pytree -> flat vector (inverse of parameters_from_flat;
    the layout users see through get_phylo_model_params)."""
    bs = block_specification(spec)
    v = np.zeros(bs.parameter_count())
    if spec.substitution == "GTR":
        start, size = bs.get_map()[GTR_RATES_KEY]
        v[start : start + size] = np.asarray(params["substitution"]["rates"])
        start, size = bs.get_map()[FREQUENCIES_KEY]
        v[start : start + size] = np.asarray(
            params["substitution"]["frequencies"]
        )
    if spec.site.startswith("weibull"):
        start, _ = bs.get_map()[WEIBULL_SHAPE_KEY]
        v[start] = float(params["site"]["shape"])
    if spec.clock == "strict":
        start, _ = bs.get_map()[CLOCK_RATE_KEY]
        v[start] = float(params["clock"]["rate"])
    return v


def model_tensors(spec: PhyloModelSpec, params: Dict):
    """Lower a parameter pytree to (freqs, evec, ivec, evals, rates, props, Q)."""
    if spec.substitution == "JC69":
        freqs, evec, ivec, evals = subst_ops.jc69_eigen()
        Q = subst_ops.jc69_q()
    elif spec.substitution == "GTR":
        p = params["substitution"]
        freqs, evec, ivec, evals = subst_ops.gtr_eigen(p["rates"], p["frequencies"])
        # Built directly from the parameters (not via the eigendecomposition)
        # so Q's AD path avoids eigh entirely — the engine's GTR transition
        # matrices differentiate through expm_transition's Daleckii-Krein
        # JVP, which stays defined at repeated eigenvalues (the
        # uniform-rates point). See ops/substitution.py.
        Q = subst_ops.gtr_q(p["rates"], p["frequencies"])
    else:
        raise ValueError(f"Substitution model not known: {spec.substitution}")

    if spec.site == "constant":
        rates, props = site_ops.constant_rates()
    elif spec.site.startswith("weibull"):
        K = spec.site_category_count()
        rates, props = site_ops.weibull_rates(params["site"]["shape"], K)
    else:
        raise ValueError(f"Site model not known: {spec.site}")

    return freqs, evec, ivec, evals, rates, props, Q


def clock_rate(spec: PhyloModelSpec, params: Dict):
    if spec.clock == "strict":
        return params["clock"]["rate"]
    return jnp.asarray(1.0)
