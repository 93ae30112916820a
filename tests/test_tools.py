"""Frame post-processing tools."""

import numpy as np
import pytest

from nbodyax.render import write_pgm
from nbodyax.tools import list_frames, make_gif, read_pgm


def test_read_pgm_roundtrip(tmp_path):
    img = np.arange(256, dtype=np.uint8).reshape(16, 16)
    p = tmp_path / "iteration_0.ppm"
    write_pgm(str(p), img)
    np.testing.assert_array_equal(read_pgm(str(p)), img)


def test_gif_assembly(tmp_path):
    pytest.importorskip("PIL")
    for i in range(3):
        img = np.full((8, 8), 254, np.uint8)
        img[i, i] = 0
        write_pgm(str(tmp_path / f"iteration_{i * 10}.ppm"), img)
    assert len(list_frames(str(tmp_path))) == 3
    out = make_gif(str(tmp_path), fps=10)
    assert out.endswith(".gif")
    raw = open(out, "rb").read()
    assert raw.startswith(b"GIF8")
