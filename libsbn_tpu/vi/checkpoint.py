"""Checkpoint/resume for VBPI training.

The reference's only persistence is CSV round trips of SBN parameters
(SURVEY.md §5.4); here full training state checkpoints — scalar q-params,
SBN params, optimizer moments, step count, and ELBO trace — round-trip
through a single .npz, and the SBN-parameter CSV compatibility path is kept
via the instance API.
"""

from __future__ import annotations

import json

import numpy as np


def save_burrito(burro, path: str):
    """Checkpoint a vi.Burrito to an .npz file."""
    opt = burro.opt
    payload = {
        "q_params": burro.scalar_model.q_params,
        "sbn_parameters": np.asarray(burro.inst.sbn_parameters),
        "step_size": np.asarray(opt.step_size),
        "sbn_step_size": np.asarray(opt.sbn_step_size),
        "step_number": np.asarray(opt.step_number),
        "elbo_trace": np.asarray(burro.elbo_trace, dtype=np.float64),
    }
    for i, leaf in enumerate(opt.ascent.state_leaves()):
        payload[f"opt_leaf_{i}"] = leaf
    meta = {
        "particle_count": burro.particle_count,
        "use_vimco": burro.use_vimco,
        "gpcsp_count": int(np.asarray(burro.inst.sbn_parameters).size),
    }
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **payload)


def restore_burrito(burro, path: str):
    """Restore training state saved by save_burrito into a freshly
    constructed Burrito over the same data/support."""
    with np.load(path) as data:
        meta = json.loads(bytes(data["meta_json"].tobytes()).decode())
        if meta["gpcsp_count"] != np.asarray(burro.inst.sbn_parameters).size:
            raise ValueError(
                "Checkpoint support size does not match this instance: "
                f"{meta['gpcsp_count']} vs "
                f"{np.asarray(burro.inst.sbn_parameters).size}. Was the "
                "checkpoint created with the same tree file and burn-in?"
            )
        burro.scalar_model.q_params[:] = data["q_params"]
        burro.inst.sbn_parameters = data["sbn_parameters"].copy()
        burro.inst._sampler = None
        opt = burro.opt
        opt.step_size = data["step_size"]
        opt.sbn_step_size = float(data["sbn_step_size"])
        opt.step_number = int(data["step_number"])
        n_leaves = len(opt.ascent.state_leaves())
        opt.ascent.load_state_leaves(
            [data[f"opt_leaf_{i}"].copy() for i in range(n_leaves)]
        )
        burro.elbo_trace = list(data["elbo_trace"])
    return burro


def save_jit_state(jv, path: str):
    """Checkpoint a vi.jit_step.JitVBPI's device state."""
    import jax

    flat, _ = jax.tree.flatten(jv.state)
    payload = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    np.savez(path, **payload)


def restore_jit_state(jv, path: str):
    import jax

    flat, treedef = jax.tree.flatten(jv.state)
    with np.load(path) as data:
        new_flat = [data[f"leaf_{i}"] for i in range(len(flat))]
    jv.state = jax.tree.unflatten(treedef, new_flat)
    return jv
