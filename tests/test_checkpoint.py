"""Checkpoint/resume: bit-exact round trip and seamless continuation."""

import numpy as np

from nbodyax.io.checkpoint import (latest_checkpoint, load_checkpoint,
                                   save_checkpoint)
from nbodyax.physics.step import PhysicsParams, make_step
from nbodyax.state import make_state


def small_state(n=16, seed=0):
    rng = np.random.RandomState(seed)
    return make_state(rng.uniform(-100, 100, (n, 2)).astype(np.float32),
                      rng.uniform(-1, 1, (n, 2)).astype(np.float32),
                      rng.uniform(1, 10, n).astype(np.float32),
                      rng.uniform(1, 3, n).astype(np.float32))


def test_roundtrip_bit_exact(tmp_path):
    st = small_state()
    path = save_checkpoint(str(tmp_path), st)
    back = load_checkpoint(path)
    for a, b in zip(st, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(tmp_path):
    step = make_step(PhysicsParams(dt=0.1, field_width=1000, field_height=1000))
    st = small_state()
    for _ in range(5):
        st = step(st)
    path = save_checkpoint(str(tmp_path), st)
    # continue directly vs continue from the checkpoint: identical
    direct = step(step(st))
    resumed = load_checkpoint(path)
    resumed = step(step(resumed))
    for a, b in zip(direct, resumed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_latest_checkpoint(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None
    st = small_state()
    save_checkpoint(str(tmp_path), st)
    st5 = st._replace(step=st.step + 5)
    p5 = save_checkpoint(str(tmp_path), st5)
    assert latest_checkpoint(str(tmp_path)) == p5


def _names(tmp_path):
    import os
    return sorted(p for p in os.listdir(tmp_path) if p.endswith(".npz"))


def test_retention_keep_last(tmp_path):
    st = small_state()
    for k in range(7):
        save_checkpoint(str(tmp_path), st._replace(step=st.step + 10 * k),
                        keep_last=3)
    assert _names(tmp_path) == [f"step_{s:09d}.npz" for s in (40, 50, 60)]
    # the newest snapshot is always among the kept
    assert latest_checkpoint(str(tmp_path)).endswith("step_000000060.npz")


def test_retention_keeps_milestones(tmp_path):
    st = small_state()
    for k in range(9):
        save_checkpoint(str(tmp_path), st._replace(step=st.step + 10 * k),
                        keep_last=2, milestone_every=40)
    # milestones at 0, 40, 80 survive; plus the 2 newest (70, 80)
    assert _names(tmp_path) == [f"step_{s:09d}.npz" for s in (0, 40, 70, 80)]


def test_retention_default_off_keeps_all(tmp_path):
    st = small_state()
    for k in range(5):
        save_checkpoint(str(tmp_path), st._replace(step=st.step + k))
    assert len(_names(tmp_path)) == 5


def test_driver_prunes_checkpoints(tmp_path):
    """checkpointKeep rides the driver: a run with cadence 2 over 10 steps
    writes 5 snapshots but keeps only the newest 2."""
    from nbodyax.config import SimConfig
    from nbodyax.driver import run_simulation

    cfg = SimConfig(particle_count=16, total_iterations=10, backend="jnp",
                    save_images=False, log_every=0, checkpoint_every=2,
                    checkpoint_keep=2, checkpoint_path=str(tmp_path / "ck"))
    run_simulation(cfg, quiet=True)
    assert _names(tmp_path / "ck") == [f"step_{s:09d}.npz" for s in (8, 10)]
