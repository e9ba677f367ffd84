import os
import time, sys
import numpy as np
import jax, jax.numpy as jnp
print("backend:", jax.default_backend(), jax.devices(), flush=True)
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import __graft_entry__ as ge
from libsbn_tpu.ops import pruning, substitution, pruning_pallas

sched, bl, sp = ge._load_ds1()
root_id = sched.root_id
dt = jnp.float32
freqs, evec, ivec, evals = substitution.jc69_eigen(dt)
Q = substitution.jc69_q(dt)
tips = np.asarray(sp.tip_partials(np.float32))
weights = sp.weights.astype(np.float32)
rates = jnp.ones((1,), dt)
bl_p = np.pad(bl, ((0,0),(0,1))).astype(np.float32)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
reps = B // bl_p.shape[0] + 1
pc = np.tile(sched.post_children, (reps, 1, 1))[:B]
blb = np.tile(bl_p, (reps, 1))[:B]
rng = np.random.default_rng(0)
blb = (blb * rng.uniform(0.8, 1.2, blb.shape)).astype(np.float32)

P_b = jax.jit(
    jax.vmap(
        lambda b: pruning.node_transition_matrices(evec, ivec, evals, b, rates)
    )
)(jnp.asarray(blb))

t0 = time.time()
import os
T = int(os.environ.get("TPP", "0")) or None
ll, g = pruning_pallas.log_likelihood_and_branch_gradient_pallas(
    pc, P_b, Q[None], tips, np.asarray(freqs), weights, root_id=root_id,
    trees_per_program=T)
ll.block_until_ready()
print(f"compile+first run ({B} trees): {time.time()-t0:.1f}s", flush=True)
print("ll[:3]:", np.asarray(ll[:3]), flush=True)

iters = 30
t0 = time.time()
for _ in range(iters):
    ll, g = pruning_pallas.log_likelihood_and_branch_gradient_pallas(
        pc, P_b, Q[None], tips, np.asarray(freqs), weights, root_id=root_id,
        trees_per_program=T)
jax.block_until_ready((ll, g))
dt_ = time.time() - t0
print(f"kernel-only: {B*iters/dt_:.0f} trees/sec ({dt_/iters*1e3:.2f} ms/iter)", flush=True)
