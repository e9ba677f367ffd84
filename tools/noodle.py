"""Perf scratchpad (the reference's noodle.cpp analog).

Micro-benchmarks for the host-side hot paths (parsing, schedule lowering,
SBN support construction) and the device pruning kernel. Run:

    python tools/noodle.py [--ladder-leaves 100]

The reference's noodle times a ladder-tree traversal; we time the same
ladder construction plus the paths that matter in this architecture.
"""

import os
_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "data")
import argparse
import sys
import time

sys.path.insert(0, ".")


def timeit(label, fn, n=5):
    fn()  # warmup
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    dt = (time.perf_counter() - t0) / n
    print(f"{label:55s} {dt * 1000:10.2f} ms")
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ladder-leaves", type=int, default=100)
    parser.add_argument("--data", default=_DATA_DIR)
    args = parser.parse_args()

    from libsbn_tpu.core.topology import Topology
    from libsbn_tpu.io import native, newick
    from libsbn_tpu.ops import schedule
    from libsbn_tpu.sbn.support import UnrootedSBNSupport

    timeit(
        f"Topology.ladder({args.ladder_leaves}) + traversal",
        lambda: [n.id for n in Topology.ladder(args.ladder_leaves).postorder()],
    )

    ds1 = f"{args.data}/DS1.100_topologies.nwk"
    timeit("parse DS1.100_topologies (native)", lambda: native.parse_tree_file(ds1, False))
    tops, bls, ttm = newick.parse_newick_file(ds1)
    with open(ds1) as f:
        text = f.read()
    timeit("parse DS1.100_topologies (pure python)",
           lambda: newick.parse_newick_string(text))
    timeit("schedules_of_topologies (native fast path)",
           lambda: schedule.schedules_of_topologies(tops))
    timeit("schedules (python)",
           lambda: schedule.batch_schedules(
               [schedule.schedule_of_topology(t) for t in tops]))
    from libsbn_tpu.core.topology import topology_counter

    counter = topology_counter(tops)
    timeit("SBN support construction (100 topologies)",
           lambda: UnrootedSBNSupport(counter, [ttm[(i, 1)] for i in range(27)]))

    # Device pruning throughput (whatever backend JAX picks).
    import jax

    import __graft_entry__ as ge

    fn, fargs = ge.entry()
    jfn = jax.jit(fn)
    out = jfn(*fargs)
    jax.block_until_ready(out)

    def run():
        out = jfn(*fargs)
        jax.block_until_ready(out)
        return out

    timeit("DS1 batched LL+gradient (10 trees, device)", run)


if __name__ == "__main__":
    main()
