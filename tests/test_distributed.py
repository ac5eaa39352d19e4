"""Two-process jax.distributed smoke test (CPU coordinator over localhost).

Backs the multi-host claim in docs/PARITY.md: `initialize_distributed`
(parallel/mesh.py) is exercised with a real coordinator + 2 worker
processes, each contributing virtual CPU devices to one global mesh, with a
cross-process psum verifying the collective path (the DCN story of
SURVEY §2.2, scaled down to localhost)."""

import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import pytest

WORKER = textwrap.dedent(
    """
    import sys
    import os
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")

    coord, pid = sys.argv[1], int(sys.argv[2])
    from volpick_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(coordinator_address=coord, num_processes=2, process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()   # 2 hosts x 2 devices
    assert jax.local_device_count() == 2

    # cross-process collective: every process contributes its process id + 1
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    total = multihost_utils.process_allgather(jnp.float32(pid + 1.0))
    assert float(total.sum()) == 3.0, total
    print(f"WORKER{pid}_OK", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_initialize_distributed(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    repo = Path(__file__).resolve().parents[1]
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=str(repo),
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"WORKER{pid}_OK" in out
