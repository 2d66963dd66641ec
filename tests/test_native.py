"""Native C++ fast-path tests (builds the library with the baked toolchain)."""
import numpy as np
import pytest

from gpu_voxels_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native.available() and not native.build():
        pytest.skip("native toolchain unavailable")


def test_parse_xyz_matches_python():
    text = b"1.5 2.25 -3.0\n4 5 6\n# comment token\n7.5 8.5 9.5 extra 1 2\n"
    pts = native.parse_xyz(text)
    # the C parser skips non-numeric tokens, like the reference's iss >> x
    flat = pts.reshape(-1)
    assert flat[:9].tolist() == [1.5, 2.25, -3.0, 4, 5, 6, 7.5, 8.5, 9.5]


def test_binvox_rle_decode():
    rle = bytes([1, 3, 0, 5, 1, 2])
    out = native.binvox_rle_decode(rle, 10)
    assert out.tolist() == [1, 1, 1, 0, 0, 0, 0, 0, 1, 1]


def test_file_reader_uses_native_path(tmp_path):
    from gpu_voxels_tpu.geometry import files

    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    f = tmp_path / "c.xyz"
    files.write_xyz(f, pts)
    assert files._native is not None and files._native.available()
    back = files.read_xyz(f)
    np.testing.assert_allclose(back, pts, atol=1e-5)
