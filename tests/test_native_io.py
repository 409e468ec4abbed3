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


def test_truncated_npz_fails_cleanly(lib_ok, tmp_path):
    """A stored entry whose payload runs past the file must error, not
    over-read the buffer (round-1 ADVICE, native/nativeio.cpp)."""
    arr = np.arange(4 * 8 * 8, dtype=np.float32).reshape(4, 8, 8)
    path = tmp_path / "t.npz"
    np.savez(str(path), arr)
    data = path.read_bytes()
    # keep the central directory intact but cut the payload: splice out a
    # chunk from the middle of the file body
    cut = len(data) // 2
    truncated = tmp_path / "trunc.npz"
    truncated.write_bytes(data[: cut - 512] + data[cut:])
    with pytest.raises(RuntimeError):
        native_io.load_npz(str(truncated))


def test_batch_loader_rejects_wrong_shape(lib_ok, tmp_path):
    """An array smaller than the batch stride must be reported as a failure,
    not silently leave uninitialised tail garbage (round-1 ADVICE)."""
    good = np.ones((4, 8, 8), np.float32)
    small = np.ones((2, 8, 8), np.float32)
    p_good, p_small = str(tmp_path / "g.npz"), str(tmp_path / "s.npz")
    np.savez(p_good, good)
    np.savez(p_small, small)
    loader = native_io.NativeBatchLoader((4, 8, 8), threads=2)
    with pytest.raises(RuntimeError, match="s.npz"):
        loader.load([p_good, p_small])
    loader.close()
