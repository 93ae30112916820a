"""Driver loop behavior: stride batching must not change results or cadence."""

import json
import os

import numpy as np

from nbodyax.config import SimConfig
from nbodyax.driver import run_simulation


def base_cfg(tmp_path, **kw):
    d = dict(particle_count=96, total_iterations=20, field_width=5000,
             field_height=5000, backend="jnp", save_images=False,
             log_path=str(tmp_path / "m.jsonl"))
    d.update(kw)
    return SimConfig(**d)


def test_stride_batching_equals_per_step(tmp_path):
    # log_every=1 -> stride 1 (per-step); log_every=5 -> stride 5 (fori_loop)
    r1 = run_simulation(base_cfg(tmp_path / "a", log_every=1), quiet=True)
    r5 = run_simulation(base_cfg(tmp_path / "b", log_every=5), quiet=True)
    np.testing.assert_allclose(np.asarray(r1.state.pos),
                               np.asarray(r5.state.pos), rtol=1e-6, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(r1.state.mass) > 0,
                                  np.asarray(r5.state.mass) > 0)
    assert int(np.asarray(r5.state.step)) == 20


def test_log_cadence_respected(tmp_path):
    cfg = base_cfg(tmp_path, log_every=5)
    os.makedirs(tmp_path, exist_ok=True)
    run_simulation(cfg, quiet=True)
    lines = [json.loads(l) for l in
             open(cfg.log_path).read().splitlines()]
    assert [l["step"] for l in lines] == [5, 10, 15, 20]


def test_no_cadence_runs_to_completion(tmp_path):
    cfg = base_cfg(tmp_path, log_every=0, total_iterations=100)
    res = run_simulation(cfg, quiet=True)
    assert int(np.asarray(res.state.step)) == 100
