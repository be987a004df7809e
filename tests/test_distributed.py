"""Multi-process distributed bring-up: the one previously-untested entry
point (parallel/mesh.init_distributed -> jax.distributed.initialize).

Spawns 2 REAL processes (CPU backend, 4 virtual devices each -> 8 global),
builds the hybrid DCNxICI-style mesh in each, and psum-reduces sweep
counters across processes — the multi-host sweep communication pattern
(SURVEY.md §2.3 distributed backend row) executed end-to-end.  Skips
cleanly where jax.distributed is unsupported."""
import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.environ["WENET_REPO"])
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from wenet_tpu.parallel import mesh as M

pid = int(sys.argv[1])
nprocs = int(sys.argv[2])
coord = sys.argv[3]

jax.config.update("jax_platforms", "cpu")
n = M.init_distributed(coordinator=coord, num_processes=nprocs,
                       process_id=pid)
if n != nprocs:
    # sitecustomize pre-imported jax and created backends before the
    # distributed init; re-create them so the CPU client attaches to the
    # coordination service (gloo collectives)
    jax.clear_backends()
    n = jax.process_count()
assert n == nprocs, f"process_count {n} != {nprocs}"
assert jax.device_count() == 4 * nprocs
assert jax.local_device_count() == 4

m = M.make_hybrid_mesh(tp=2)            # (batch=4, model=2) over 8 devices
assert m.devices.shape == (4, 2)

# psum sweep counters across the whole mesh (the ldpc_ber_sweep reduction
# pattern, sweep.py:75-81): each device contributes its local count; every
# process must see the same global total
from functools import partial
from jax.experimental import multihost_utils

local = (np.arange(jax.local_device_count() * 2, dtype=np.int32)
         .reshape(-1, 2) + 100 * pid)
arr = multihost_utils.host_local_array_to_global_array(
    local, m, P("batch", "model"))


@jax.jit
@partial(jax.shard_map, mesh=m, in_specs=P("batch", "model"),
         out_specs=P())
def count(x):
    return jax.lax.psum(jnp.sum(x, dtype=jnp.int32), ("batch", "model"))


total = count(arr)
got = int(np.asarray(multihost_utils.process_allgather(
    total, tiled=True)).ravel()[0])
n_local = jax.local_device_count() * 2
expect = sum(int(np.arange(n_local).sum() + 100 * p * n_local)
             for p in range(nprocs))
print(json.dumps({"pid": pid, "got": got, "expect": expect}), flush=True)
assert got == expect
"""


def test_init_distributed_two_processes(tmp_path):
    # free port for the coordinator
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ,
               WENET_REPO=os.path.join(os.path.dirname(__file__), ".."))
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", coord],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed coordinator timed out on this host")
    for rc, out, err in outs:
        if rc != 0 and ("unimplemented" in err.lower()
                        or "not supported" in err.lower()):
            pytest.skip(f"jax.distributed unsupported: {err[-200:]}")
        assert rc == 0, f"worker failed: {err[-800:]}"
    results = [json.loads(out.strip().splitlines()[-1])
               for _, out, _ in outs]
    assert results[0]["got"] == results[0]["expect"]
    assert results[1]["got"] == results[1]["expect"]
