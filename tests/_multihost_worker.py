"""Worker process for the 2-process `jax.distributed` smoke test
(`tests/test_parallel.py::test_multihost_two_process_commit`).

Each process brings 2 virtual CPU devices; the pair forms a 4-device
global mesh via `parallel/multihost.py`, runs a dp-sharded trace commit
(client axis split across PROCESSES), replicates the roots back through a
real cross-process collective, and checks them against the local
single-device computation.

Usage: python _multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=2")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from zk_stark_project_tpu.ops import blake3 as b3
    from zk_stark_project_tpu.ops import f128, f128_ref, ntt
    from zk_stark_project_tpu.parallel import multihost

    info = multihost.initialize(f"127.0.0.1:{port}", nproc, pid)
    assert info.enabled, "distributed service did not start"
    assert info.num_processes == nproc, info
    assert info.global_device_count == 2 * nproc, info

    mesh = multihost.global_mesh(tp=1, axis_names=("dp", "tp"))
    assert mesh.devices.size == 2 * nproc

    # same seeded inputs on every process
    width, n, blowup = 4, 8, 2
    rng = np.random.default_rng(0)
    clients = 2 * nproc
    stacked_np = np.stack([
        np.asarray(f128.from_ints(np.asarray(
            rng.integers(0, 2 ** 62, size=(width, n)), dtype=object)))
        for _ in range(clients)])                       # (C, 8, W, n)

    def commit_one(trace):
        polys = ntt.interpolate(trace)
        lde = ntt.coset_evaluate(polys, f128_ref.GENERATOR, blowup)
        words = f128.to_uint32_words(lde)
        words = jnp.transpose(words, (2, 1, 0)).reshape(n * blowup,
                                                        width * 4)
        leaves = b3.hash_words(words, width * 16)
        cur = leaves
        while cur.shape[0] > 1:
            cur = b3.merge(cur[0::2], cur[1::2])
        return cur[0]

    dp_sharding = NamedSharding(mesh, P("dp"))
    garr = jax.make_array_from_callback(
        stacked_np.shape, dp_sharding, lambda idx: stacked_np[idx])
    # replicated output = a REAL cross-process all-gather on the dp axis
    step = jax.jit(jax.vmap(commit_one), in_shardings=dp_sharding,
                   out_shardings=NamedSharding(mesh, P()))
    roots = np.asarray(step(garr))                      # (C, 8) everywhere

    expected = np.stack([
        np.asarray(jax.jit(commit_one)(jnp.asarray(stacked_np[i])))
        for i in range(clients)])
    assert (roots == expected).all(), "cross-process roots diverged"
    print(f"MULTIHOST OK pid={pid} procs={info.num_processes} "
          f"devices={info.global_device_count}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
