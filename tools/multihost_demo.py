"""Two-process multi-host VBPI demo/validation (CPU backend).

Each process gets 2 virtual CPU devices; the global (dp=4) mesh spans both
processes, each samples its half of the global particle batch, and the jitted
step allreduces gradients across processes. Run via tests/test_multihost.py
or manually:

  LIBSBN_PROC=0 python tools/multihost_demo.py & LIBSBN_PROC=1 python tools/multihost_demo.py
"""

import os
import sys

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")

PROC = int(os.environ.get("LIBSBN_PROC", sys.argv[1] if len(sys.argv) > 1 else 0))
PORT = os.environ.get("LIBSBN_PORT", "12357")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

from libsbn_tpu.parallel import distributed

distributed.initialize(
    coordinator_address=f"127.0.0.1:{PORT}", num_processes=2, process_id=PROC
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()

import numpy as np

from libsbn_tpu import UnrootedInstance
from libsbn_tpu.models.phylo_model import PhyloModelSpec
from libsbn_tpu.vi.jit_step import JitVBPI

mesh = distributed.global_mesh(dp=4, sp=1)

inst = UnrootedInstance("mh")
inst.read_nexus_file(f"{_DATA_DIR}/hello_out.t")
inst.process_loaded_trees()
inst.train_simple_average()
inst.read_fasta_file(f"{_DATA_DIR}/hello.fasta")
inst.prepare_for_phylo_likelihood(PhyloModelSpec("JC69", "constant", "strict"))

jv = JitVBPI(inst, particle_count=8, mesh=mesh, seed=0)
assert jv.local_particle_count == 4
lls = []
for i in range(3):
    metrics = jv.step(beta=1.0)
    ll = float(metrics["mean_ll"])
    assert np.isfinite(ll), ll
    lls.append(ll)
# Replicated state must agree across processes after the allreduced updates.
checksum = float(np.sum(np.asarray(jv.state.sbn_params)))
print(f"MULTIHOST_OK proc={PROC} mean_ll={lls[-1]:.6f} checksum={checksum:.10f}",
      flush=True)
