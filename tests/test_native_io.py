"""Native IO kernels vs the pure-Python fallbacks — byte-identical formats."""

import io

import numpy as np
import pytest

from stencilstream_tpu import native
from stencilstream_tpu.utils import io as ssio

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_char_grid_roundtrip():
    rng = np.random.default_rng(0)
    g = rng.random((13, 29)) < 0.4
    text = native.format_char_grid(g)
    assert text.decode().count("\n") == 13
    back = native.parse_char_grid(text, 13, 29)
    np.testing.assert_array_equal(back, g)


def test_char_grid_matches_python():
    rng = np.random.default_rng(1)
    g = rng.random((7, 11)) < 0.5
    py = io.StringIO()
    for row in g:
        py.write("".join("X" if v else "." for v in row) + "\n")
    assert native.format_char_grid(g).decode() == py.getvalue()
    np.testing.assert_array_equal(
        native.parse_char_grid(py.getvalue().encode(), 7, 11), g
    )


def test_char_grid_errors():
    with pytest.raises(ValueError, match=r"unexpected character at cell \(1, 0\)"):
        native.parse_char_grid(b"XXQ.", 2, 2)
    with pytest.raises(ValueError, match="truncated"):
        native.parse_char_grid(b"X.", 2, 2)


def test_parse_floats_matches_numpy():
    rng = np.random.default_rng(2)
    vals = rng.normal(size=100).astype(np.float32)
    text = " ".join(f"{v:.9g}" for v in vals).encode()
    out = native.parse_floats(text, 100)
    np.testing.assert_allclose(out, vals, rtol=1e-6)


def test_parse_floats_truncated():
    with pytest.raises(ValueError, match="parsed 2"):
        native.parse_floats(b"1.0 2.0", 5)


def test_indexed_text_matches_python():
    vals = np.array([1.5, -2.0, 3.25e-5, 80.0], np.float32)
    want = "".join(f"{i}\t{v:g}\n" for i, v in enumerate(vals))
    assert native.format_indexed_text(vals).decode() == want


def test_csv_matches_savetxt(tmp_path):
    rng = np.random.default_rng(3)
    g = rng.normal(size=(5, 7)).astype(np.float32)
    p1, p2 = tmp_path / "native.csv", tmp_path / "py.csv"
    with open(p1, "wb") as f:
        f.write(native.format_csv(g))
    np.savetxt(p2, g, fmt="%g", delimiter=",")
    np.testing.assert_allclose(
        np.loadtxt(p1, delimiter=","), np.loadtxt(p2, delimiter=","), rtol=1e-6
    )


def test_io_module_dispatch_roundtrip():
    rng = np.random.default_rng(4)
    g = rng.random((9, 9)) < 0.3
    buf = io.StringIO()
    ssio.write_char_grid(buf, g)
    buf.seek(0)
    np.testing.assert_array_equal(ssio.read_char_grid(buf, 9, 9), g)
