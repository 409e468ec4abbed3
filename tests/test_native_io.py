"""Native C++ npz loader vs numpy (build + parse + threaded batch)."""
import numpy as np
import pytest

from asy_vrnet_tpu.data import native_io


@pytest.fixture(scope="module")
def lib_ok():
    if not native_io.native_available():
        pytest.skip(f"native io unavailable: {native_io.build_error()}")
    return True


def test_load_npz_stored(lib_ok, tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((4, 16, 24)).astype(np.float32)
    path = str(tmp_path / "a.npz")
    np.savez(path, arr)
    out = native_io.load_npz(path)
    np.testing.assert_array_equal(out, arr)


def test_load_npz_compressed(lib_ok, tmp_path):
    rng = np.random.default_rng(1)
    arr = (rng.standard_normal((4, 32, 32)) * 0).astype(np.float32)  # compressible
    arr[0, :5] = rng.standard_normal((5, 32))
    path = str(tmp_path / "c.npz")
    np.savez_compressed(path, arr)
    out = native_io.load_npz(path)
    np.testing.assert_array_equal(out, arr)


def test_load_npz_float64_converts(lib_ok, tmp_path):
    arr = np.linspace(0, 1, 24).reshape(2, 3, 4)
    path = str(tmp_path / "d.npz")
    np.savez(path, arr)
    out = native_io.load_npz(path)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, arr.astype(np.float32))


def test_named_member(lib_ok, tmp_path):
    a = np.ones((2, 2), np.float32)
    b = np.full((3, 3), 7.0, np.float32)
    path = str(tmp_path / "m.npz")
    np.savez(path, first=a, second=b)
    np.testing.assert_array_equal(native_io.load_npz(path, "second"), b)


def test_batch_loader_parallel(lib_ok, tmp_path):
    rng = np.random.default_rng(2)
    arrs, paths = [], []
    for i in range(8):
        arr = rng.standard_normal((4, 8, 8)).astype(np.float32)
        path = str(tmp_path / f"r{i}.npz")
        np.savez(path, arr)
        arrs.append(arr)
        paths.append(path)
    loader = native_io.NativeBatchLoader((4, 8, 8), threads=4)
    out = loader.load(paths)
    assert out.shape == (8, 4, 8, 8)
    for i in range(8):
        np.testing.assert_array_equal(out[i], arrs[i])
    # missing file reported with its path
    with pytest.raises(RuntimeError, match="nope"):
        loader.load([paths[0], str(tmp_path / "nope.npz")])
    loader.close()
