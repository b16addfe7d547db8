"""Two-process jax.distributed smoke test on CPU — the JAX-standard stand-in
for multi-host TPU hardware (SURVEY.md section 4 implication (c)). Each
process owns 2 virtual CPU devices; a psum over the 4-device global mesh must
see every process's contribution."""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from foundationpose_tpu.parallel import multihost

rank = int(sys.argv[1])
multihost.initialize(coordinator_address={coord!r}, num_processes=2,
                     process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = multihost.make_global_mesh(("batch",))
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("batch")),
    np.full((2, 1), float(rank + 1), np.float32),  # host0 -> [1,1], host1 -> [2,2]
    (4, 1),
)
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)
np.testing.assert_allclose(np.asarray(total), 6.0)
multihost.sync_hosts("done")
print("RANK%d_OK" % rank, flush=True)
"""


def test_two_process_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo, coord=f"localhost:{port}"))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {rank} timed out")
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
    for rank, out in enumerate(outs):
        assert f"RANK{rank}_OK" in out, out
