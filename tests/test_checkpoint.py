"""Checkpoint/resume round trip for VBPI training state."""

import os
import numpy as np
import pytest

from libsbn_tpu.models.phylo_model import PhyloModelSpec
from libsbn_tpu.vi import checkpoint
from libsbn_tpu.vi.burrito import Burrito

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data"
)


def make_burrito(seed=0):
    return Burrito(
        mcmc_nexus_path=f"{DATA}/hello_out.t",
        burn_in_fraction=0,
        fasta_path=f"{DATA}/hello.fasta",
        phylo_model_specification=PhyloModelSpec("JC69", "constant", "strict"),
        branch_model_name="split",
        scalar_model_name="lognormal",
        optimizer_name="simple",
        particle_count=3,
        seed=seed,
    )


def test_burrito_checkpoint_roundtrip(tmp_path):
    burro = make_burrito()
    burro.gradient_steps(5)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_burrito(burro, path)

    fresh = make_burrito(seed=99)
    checkpoint.restore_burrito(fresh, path)
    np.testing.assert_array_equal(
        fresh.scalar_model.q_params, burro.scalar_model.q_params
    )
    np.testing.assert_array_equal(
        fresh.inst.sbn_parameters, burro.inst.sbn_parameters
    )
    assert fresh.opt.step_number == burro.opt.step_number
    for mine, theirs in zip(
        fresh.opt.ascent.state_leaves(), burro.opt.ascent.state_leaves()
    ):
        np.testing.assert_array_equal(mine, theirs)
    # Training continues from the restored state without error.
    fresh.gradient_steps(2)
    assert len(fresh.elbo_trace) == 7


def test_burrito_checkpoint_mismatch(tmp_path):
    import json

    burro = make_burrito()
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save_burrito(burro, path)
    # Tamper with the recorded support size to simulate a checkpoint from a
    # different tree file.
    with np.load(path) as data:
        payload = {k: data[k] for k in data.files}
    meta = json.loads(bytes(payload["meta_json"].tobytes()).decode())
    meta["gpcsp_count"] += 7
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez(path, **payload)
    with pytest.raises(ValueError, match="support size"):
        checkpoint.restore_burrito(make_burrito(), path)


def test_jit_state_roundtrip(tmp_path):
    from libsbn_tpu import UnrootedInstance
    from libsbn_tpu.vi.jit_step import JitVBPI

    inst = UnrootedInstance("x")
    inst.read_nexus_file(f"{DATA}/hello_out.t")
    inst.process_loaded_trees()
    inst.train_simple_average()
    inst.read_fasta_file(f"{DATA}/hello.fasta")
    inst.prepare_for_phylo_likelihood(PhyloModelSpec("JC69", "constant", "strict"))
    jv = JitVBPI(inst, particle_count=4, seed=0)
    jv.step()
    jv.step()
    path = str(tmp_path / "jit.npz")
    checkpoint.save_jit_state(jv, path)
    before = np.asarray(jv.state.q_params)
    jv.step()
    assert not np.allclose(np.asarray(jv.state.q_params), before)
    checkpoint.restore_jit_state(jv, path)
    np.testing.assert_array_equal(np.asarray(jv.state.q_params), before)
