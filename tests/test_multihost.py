"""Multi-host bring-up smoke (VERDICT r2 missing #2): a 2-process CPU
``jax.distributed`` run — localhost coordinator, 2 virtual devices per
process — driving one ring step through ``maybe_init_distributed``, the one
code path no single-process test can reach. The checksums must agree across
the two processes AND with this (single-process) suite's own 4-shard run of
the identical step, so the cross-process ppermute hops are verified against
the in-process mesh, not just "it didn't crash"."""

import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _reference_checksums():
    """The same step the children run, on this process's own 4-device mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nbodyax.config import SimConfig
    from nbodyax.physics.step import PhysicsParams
    from nbodyax.sharding.mesh import AXIS, make_mesh
    from nbodyax.sharding.ring import make_sharded_step
    from nbodyax.state import make_state

    rng = np.random.RandomState(42)
    n = 32
    pos = rng.uniform(-1000, 1000, (n, 2)).astype(np.float32)
    vel = rng.uniform(-3, 3, (n, 2)).astype(np.float32)
    mass = rng.uniform(1, 100, n).astype(np.float32)
    mass[3] = 0.0
    radius = rng.uniform(5, 40, n).astype(np.float32)

    cfg = SimConfig(particle_count=n, shards=4, field_width=1000,
                    field_height=1000, timestep=0.1,
                    save_images=False).validate()
    p = PhysicsParams.from_config(cfg)
    mesh = make_mesh(4)
    st = make_state(pos, vel, mass, radius)
    sh = NamedSharding(mesh, P(AXIS))
    st = jax.tree.map(
        lambda x: jax.device_put(x, sh) if np.ndim(x) else x, st)
    out = make_sharded_step(cfg, p, mesh)(st)
    return [float(out.pos.sum()), float(out.vel.sum()),
            float(out.mass.sum())]


@pytest.mark.slow
def test_two_process_distributed_ring_step(tmp_path):
    port = _free_port()
    env_base = {
        **os.environ,
        "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
        "JAX_NUM_PROCESSES": "2",
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs = []
    for pid in range(2):
        env = dict(env_base, JAX_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, CHILD], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    try:
        for pr in procs:
            out, err = pr.communicate(timeout=240)
            assert pr.returncode == 0, f"child failed:\n{out}\n{err}"
            outs.append(out)
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()

    sums = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("CHECKSUM")]
        assert line, out
        sums.append([float(v) for v in line[0].split()[1:]])
    # both controllers computed the identical global program
    np.testing.assert_array_equal(sums[0], sums[1])
    # ... and it matches the in-process 4-shard run of the same step
    np.testing.assert_allclose(sums[0], _reference_checksums(),
                               rtol=1e-5, atol=1e-4)
