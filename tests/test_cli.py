"""End-to-end CLI test: tiny run produces valid frames, metrics, checkpoints,
and an exact reference-format 'Time taken' line."""

import json
import os

import numpy as np
import pytest

from nbodyax.cli import main


@pytest.fixture
def tiny_config(tmp_path):
    cfg = tmp_path / "nbodyConfig.txt"
    cfg.write_text(
        "particleCount=64\n"
        "totalIterations=12\n"
        "save_Image_Every_Xth_Iteration=5\n"
        "timestep=0.2f\n"
        "radiusGrowthRate=0.1f\n"
        "minRandBodyMass=1e4f\n"
        "maxRandBodyMass=1e17f\n"
        "minRadius=50.f\n"
        "maxRadius=200.f\n"
        "imgWidth=64\n"
        "imgHeight=64\n"
        "fieldWidth=10000\n"
        "fieldHeight=10000\n"
        f"imagePath={tmp_path / 'frames'}\n"
        f"logPath={tmp_path / 'metrics.jsonl'}\n"
        f"checkpointPath={tmp_path / 'ckpt'}\n"
        "checkpointEvery=6\n"
        "logEvery=1\n")
    return cfg, tmp_path


def test_cli_end_to_end(tiny_config, capsys):
    cfg_path, tmp_path = tiny_config
    rc = main(["--config", str(cfg_path)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Time taken:" in out  # nbody.cu:548 format

    # frames at iterations 0, 5, 10 with valid P5 payloads
    frames = sorted(os.listdir(tmp_path / "frames"))
    assert frames == ["iteration_0.ppm", "iteration_10.ppm", "iteration_5.ppm"]
    raw = (tmp_path / "frames" / "iteration_0.ppm").read_bytes()
    assert raw.startswith(b"P5\n64 64\n255\n")
    body = np.frombuffer(raw.split(b"255\n", 1)[1], np.uint8)
    assert body.size == 64 * 64
    assert (body == 0).any() and (body == 254).any()  # bodies on background

    # metrics JSONL
    lines = [json.loads(l) for l in
             (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert len(lines) == 12
    assert lines[-1]["step"] == 12
    assert lines[-1]["alive"] <= 64
    assert lines[-1]["pairs_per_sec"] > 0

    # checkpoints at 6 and 12
    cks = sorted(os.listdir(tmp_path / "ckpt"))
    assert cks == ["step_000000006.npz", "step_000000012.npz"]


def test_cli_resume(tiny_config, capsys):
    cfg_path, tmp_path = tiny_config
    assert main(["--config", str(cfg_path), "--quiet"]) == 0
    # resume from latest: runs steps 12.. but totalIterations=12 -> no-op run
    assert main(["--config", str(cfg_path), "--quiet", "--resume", "auto",
                 "--steps", "14", "--no-images"]) == 0
    cks = sorted(os.listdir(tmp_path / "ckpt"))
    assert "step_000000012.npz" in cks


def test_cli_missing_config_errors(tmp_path, capsys):
    rc = main(["--config", str(tmp_path / "nope.txt")])
    assert rc == 1
    assert "Error opening config file!" in capsys.readouterr().err
