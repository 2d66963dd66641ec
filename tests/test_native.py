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


def test_binvox_rle_points_matches_dense_decode():
    """Direct RLE->coords must equal dense-decode + nonzero, same order."""
    rng = np.random.default_rng(7)
    depth = height = width = 8
    size = depth * height * width
    grid = (rng.uniform(size=size) < 0.3).astype(np.uint8)
    # build an RLE stream (runs capped at 255 like the format requires)
    rle = []
    i = 0
    while i < size:
        v = grid[i]
        run = 1
        while i + run < size and grid[i + run] == v and run < 255:
            run += 1
        rle += [int(v), run]
        i += run
    rle = bytes(rle)
    dense = native.binvox_rle_decode(rle, size)
    np.testing.assert_array_equal(dense, grid)
    x, z, y = np.nonzero(dense.reshape(depth, height, width) == 1)
    expect = np.stack([x, y, z], axis=1).astype(np.int32)
    got = native.binvox_rle_points(rle, size, height, width)
    np.testing.assert_array_equal(got, expect)


def test_load_point_clouds_batch(tmp_path):
    from gpu_voxels_tpu.geometry import files

    rng = np.random.default_rng(1)
    paths = []
    ptss = []
    for i in range(5):
        pts = rng.normal(size=(50 + i, 3)).astype(np.float32)
        p = tmp_path / f"c{i}.xyz"
        files.write_xyz(p, pts)
        paths.append(p)
        ptss.append(pts)
    out = files.load_point_clouds(paths, scaling=2.0)
    assert len(out) == 5
    for got, pts in zip(out, ptss):
        np.testing.assert_allclose(got, 2.0 * pts, atol=1e-4)
    assert files.load_point_clouds([]) == []


def test_file_reader_uses_native_path(tmp_path):
    from gpu_voxels_tpu.geometry import files

    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    f = tmp_path / "c.xyz"
    files.write_xyz(f, pts)
    assert files._native is not None and files._native.available()
    back = files.read_xyz(f)
    np.testing.assert_allclose(back, pts, atol=1e-5)
