"""Coverage for auxiliary paths: profiler capture, tools CLI, frame-writer
failure surfacing, explicit checkpoint resume."""

import os

import numpy as np
import pytest

from nbodyax.config import SimConfig
from nbodyax.driver import run_simulation


@pytest.mark.slow
def test_profiler_trace_capture(tmp_path):
    cfg = SimConfig(particle_count=32, total_iterations=3, field_width=1000,
                    field_height=1000, backend="jnp", save_images=False,
                    log_every=0)
    run_simulation(cfg, quiet=True, profile_dir=str(tmp_path / "trace"))
    # jax.profiler writes plugins/profile/<ts>/*.xplane.pb under the dir
    found = []
    for root, _, files in os.walk(tmp_path / "trace"):
        found += [f for f in files if f.endswith(".xplane.pb")]
    assert found, "no profiler artifacts captured"


def test_tools_cli_main(tmp_path):
    pytest.importorskip("PIL")
    from nbodyax.render import write_pgm
    from nbodyax.tools import main
    img = np.full((8, 8), 254, np.uint8)
    write_pgm(str(tmp_path / "iteration_0.ppm"), img)
    rc = main(["gif", str(tmp_path), str(tmp_path / "out.gif"), "--fps", "5"])
    assert rc == 0
    assert (tmp_path / "out.gif").exists()


def test_frame_writer_failure_surfaces(tmp_path):
    from nbodyax.render import FrameWriter
    w = FrameWriter(str(tmp_path / "frames"))
    # valid frame works
    w.submit(0, np.zeros((4, 4), np.uint8))
    w.close()
    # unwritable path: the background error must surface on close()
    bad = FrameWriter(str(tmp_path / "frames2"))
    os.rmdir(tmp_path / "frames2")
    open(tmp_path / "frames2", "w").close()  # block the dir with a file
    bad.submit(1, np.zeros((4, 4), np.uint8))
    with pytest.raises(RuntimeError, match="frame writer failed"):
        bad.close()


def test_cli_resume_explicit_file(tmp_path):
    from nbodyax.cli import main
    from nbodyax.io.checkpoint import latest_checkpoint
    args = ["--set", "particleCount=32", "--set", "fieldWidth=1000",
            "--set", "fieldHeight=1000", "--set", "backend=jnp",
            "--set", f"checkpointPath={tmp_path / 'ckpt'}",
            "--set", "checkpointEvery=4", "--set", "logEvery=0",
            "--no-images", "--quiet"]
    assert main(args + ["--steps", "8"]) == 0
    ck = latest_checkpoint(str(tmp_path / "ckpt"))
    assert ck and ck.endswith("step_000000008.npz")
    assert main(args + ["--steps", "12", "--resume", ck]) == 0
    assert latest_checkpoint(str(tmp_path / "ckpt")).endswith(
        "step_000000012.npz")
