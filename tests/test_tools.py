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


def test_dump_checkpoint(tmp_path, capsys):
    import numpy as np
    from nbodyax.io.checkpoint import save_checkpoint
    from nbodyax.state import make_state
    from nbodyax.tools import main as tools_main

    st = make_state(np.array([[1.25, -2.5], [3.0, 4.0]], np.float32),
                    np.array([[0.5, 0.0], [0.0, -1.0]], np.float32),
                    np.array([10.0, 0.0], np.float32),
                    np.array([2.0, 3.0], np.float32))
    path = save_checkpoint(str(tmp_path / "ck"), st)
    assert tools_main(["dump", path]) == 0
    out = capsys.readouterr().out
    assert "Body #0" in out
    assert "Position: (1.2500, -2.5000)" in out     # printData format
    assert "Body #1 (dead)" in out
    assert "1 alive / 2 slots" in out

    assert tools_main(["dump", path, "--alive-only"]) == 0
    out = capsys.readouterr().out
    assert "Body #1" not in out
