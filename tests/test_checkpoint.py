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
