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


def test_checkpoint_extra_roundtrip(tmp_path):
    """Scalar metadata rides the snapshot under meta_ keys and comes back
    as Python scalars; snapshots without any return {}."""
    from nbodyax.io.checkpoint import (load_checkpoint, load_checkpoint_extra,
                                       save_checkpoint)
    st = small_state()._replace(step=np.int32(7))
    p = save_checkpoint(str(tmp_path), st,
                        extra={"bh_levels": 9, "bh_neighbor_k": 264,
                               "bh_comp_cap": 683008, "bh_near_slots": 1})
    assert load_checkpoint_extra(p) == {
        "bh_levels": 9, "bh_neighbor_k": 264,
        "bh_comp_cap": 683008, "bh_near_slots": 1}
    # state itself unaffected by the extra fields
    back = load_checkpoint(p)
    np.testing.assert_array_equal(np.asarray(back.mass), np.asarray(st.mass))
    p2 = save_checkpoint(str(tmp_path), small_state()._replace(step=np.int32(8)))
    assert load_checkpoint_extra(p2) == {}


def test_resume_adopts_adapted_bh_knobs(tmp_path):
    """A resume adopts the snapshot's saved (adapted) bh knobs into the
    USER-AUTO fields only — re-walking the adapt ladder's multi-minute
    recompiles on every crash recovery is what the metadata exists to
    avoid (r5 soak). Pinned knobs are never overridden."""
    import dataclasses
    from nbodyax.config import SimConfig
    from nbodyax.driver import _adopt_ck_knobs
    from nbodyax.io.checkpoint import save_checkpoint
    p = save_checkpoint(str(tmp_path), small_state()._replace(step=np.int32(5)),
                        extra={"bh_levels": 9, "bh_neighbor_k": 264,
                               "bh_comp_cap": 683008, "bh_near_slots": 1})
    cfg = SimConfig(particle_count=64, force_model="bh", save_images=False)
    out = _adopt_ck_knobs(cfg, p)
    assert (out.bh_levels, out.bh_neighbor_k, out.bh_comp_cap,
            out.bh_near) == (9, 264, 683008, "slots")
    pinned = dataclasses.replace(cfg, bh_levels=6, bh_neighbor_k=32,
                                 bh_near="rows")
    out2 = _adopt_ck_knobs(pinned, p)
    assert (out2.bh_levels, out2.bh_neighbor_k, out2.bh_near) == (
        6, 32, "rows")
    assert out2.bh_comp_cap == 683008      # the one auto field adopts
    # non-bh configs pass through untouched
    exact = SimConfig(particle_count=64, save_images=False)
    assert _adopt_ck_knobs(exact, p) is exact
