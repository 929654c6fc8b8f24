"""Multi-host (multi-process) SPMD: 2 CPU processes, one device each,
forming a global 2-way data-parallel mesh over Gloo collectives.

Validates the DCN story the reference gets from torch.distributed/NCCL DDP
(SURVEY.md §2.4): `jax.distributed.initialize` + a global Mesh + per-host
data sharding (`shard_iterator(rank, world_size)`) + the gradient
all-reduce the SPMD partitioner inserts — the distributed-grad result must
equal the single-process full-batch gradient bit-for-bit-ish.

Runs as real subprocesses (spawned here) because multi-process JAX cannot
be simulated in-process; skips with a reason if the environment cannot
spawn or lacks the Gloo CPU collective backend.
"""

import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent("""
    import os, sys, json
    import jax

    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1])
    port = sys.argv[2]
    # generous rendezvous timeout: under CPU contention (parallel test runs)
    # the two workers' jax imports can skew by >30 s
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid,
                               initialization_timeout=240)
    # force backend init NOW (the gloo transport key-value exchange has its
    # own ~30 s deadline): the facodec_tpu/flax imports below take tens of
    # seconds on a loaded 1-CPU host and would skew the two workers past it
    jax.devices()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from facodec_tpu.parallel.mesh import DATA_AXIS, make_mesh, replicate
    from facodec_tpu.train.data import PseudoDataset, shard_iterator

    assert jax.process_count() == 2 and jax.process_index() == pid

    # global 2-way data mesh (one device per process)
    mesh = make_mesh()
    assert mesh.devices.size == 2

    # --- per-host data sharding: each process consumes a disjoint index set
    class IndexDataset:
        def __init__(self):
            self.seen = []
            self.ds = PseudoDataset(length=8, seed=0, min_s=1.0, max_s=1.0)
        def __len__(self):
            return 8
        def __getitem__(self, i):
            self.seen.append(int(i))
            return self.ds[i]

    ds = IndexDataset()
    list(shard_iterator(ds, 2, rank=pid, world_size=2, shuffle=False))
    local = ds.seen

    # --- the global batch for the gradient check: deterministic, disjoint
    rng = np.random.default_rng(0)
    X = rng.standard_normal((8, 16)).astype(np.float32)
    Y = rng.standard_normal((8,)).astype(np.float32)
    w = jnp.asarray(np.linspace(-1, 1, 16, dtype=np.float32))

    x_global = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), X[pid * 4 : (pid + 1) * 4])
    y_global = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(DATA_AXIS)), Y[pid * 4 : (pid + 1) * 4])
    w = replicate(mesh, w)

    def loss(w, x, y):
        return jnp.mean(jnp.square(x @ w - y))

    with mesh:
        g = jax.jit(jax.grad(loss))(w, x_global, y_global)  # SPMD all-reduce
    g = np.asarray(jax.device_get(g))

    # single-process full-batch reference (pure numpy)
    g_ref = 2.0 / 8.0 * X.T @ (X @ np.asarray(jax.device_get(w)) - Y)

    print(json.dumps({
        "pid": pid,
        "grad_ok": bool(np.allclose(g, g_ref, rtol=1e-5, atol=1e-6)),
        "indices": local,
    }), flush=True)
""")


def test_two_process_distributed_grad(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers use 1 device each, not 8 virtual
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("PYTHONPATH", os.path.dirname(os.path.dirname(__file__)))
    port = "29517"
    try:
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(i), port], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                cwd=os.path.dirname(os.path.dirname(__file__)),
            )
            for i in range(2)
        ]
    except OSError as e:  # pragma: no cover
        pytest.skip(f"cannot spawn subprocesses here: {e}")

    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:  # pragma: no cover
            p.kill()
            pytest.fail("distributed worker hung")
        outs.append(out.decode())

    import json

    sums = []
    for p, out in zip(procs, outs):
        if p.returncode != 0 and ("gloo" in out.lower() or "collective" in out.lower()):
            pytest.skip(f"no CPU collective backend: {out[-300:]}")  # pragma: no cover
        assert p.returncode == 0, out[-1500:]
        payload = json.loads(out.strip().splitlines()[-1])
        assert payload["grad_ok"], out[-1500:]
        sums.append(set(payload["indices"]))
    # the two hosts consumed disjoint data shards covering the dataset
    assert sums[0].isdisjoint(sums[1])
    assert sums[0] | sums[1] == set(range(8))
