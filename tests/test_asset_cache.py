"""Node-local mmap asset cache (state/asset_cache.py)."""

import os

import numpy as np
import pytest

from language_identification_ray.state.asset_cache import mmap_derived


@pytest.fixture()
def cache_dir(tmp_path, monkeypatch):
    d = tmp_path / "cache"
    monkeypatch.setattr(
        "language_identification_ray.state.asset_cache._CACHE_DIR", str(d)
    )
    return d


def _src(tmp_path, arr, name="src.npz"):
    p = tmp_path / name
    np.savez(p, data=arr)
    return p


def test_roundtrip_and_single_build(tmp_path, cache_dir):
    arr = np.arange(20, dtype=np.float32).reshape(4, 5)
    src = _src(tmp_path, arr)
    calls = []

    def build():
        calls.append(1)
        return arr * 2

    a = mmap_derived("t", src, build)
    b = mmap_derived("t", src, build)
    np.testing.assert_array_equal(a, arr * 2)
    np.testing.assert_array_equal(b, arr * 2)
    assert len(calls) == 1  # second call hits the cache file
    assert not a.flags.writeable  # read-only mapping


def test_mtime_invalidation(tmp_path, cache_dir):
    arr = np.ones(8)
    src = _src(tmp_path, arr)
    a = mmap_derived("t", src, lambda: arr)
    # retrain: newer source → new cache entry, old one untouched
    os.utime(src, ns=(os.stat(src).st_mtime_ns + 10, os.stat(src).st_mtime_ns + 10))
    b = mmap_derived("t", src, lambda: arr + 1)
    np.testing.assert_array_equal(a, arr)
    np.testing.assert_array_equal(b, arr + 1)


def test_layout_preserved(tmp_path, cache_dir):
    arr = np.arange(12, dtype=np.float64).reshape(3, 4)
    src = _src(tmp_path, arr)
    out = mmap_derived("t", src, lambda: arr.astype(np.float32).T)
    assert out.dtype == np.float32
    assert out.shape == (4, 3)
    assert out.flags.c_contiguous


def test_no_tmp_litter(tmp_path, cache_dir):
    src = _src(tmp_path, np.ones(4))
    mmap_derived("t", src, lambda: np.ones(4))
    leftovers = [f for f in os.listdir(cache_dir) if f.endswith(".tmp")]
    assert leftovers == []


def test_stale_generations_pruned_on_rebuild(tmp_path, monkeypatch):
    """A retrain (new source mtime) must replace, not accumulate, the cached
    derived array; orphaned fresh .tmp files survive (in-flight writers)."""
    import os
    import time

    import numpy as np

    from language_identification_ray.state import asset_cache

    cache = tmp_path / "cache"
    monkeypatch.setattr(asset_cache, "_CACHE_DIR", str(cache))
    src = tmp_path / "src.bin"
    src.write_bytes(b"v1")
    asset_cache.mmap_derived("a", src, lambda: np.arange(3))
    time.sleep(0.01)
    src.write_bytes(b"v2")  # new mtime -> new generation
    os.utime(src)
    fresh_tmp = None
    os.makedirs(cache, exist_ok=True)
    fresh_tmp = cache / "inflight.npy.tmp"
    fresh_tmp.write_bytes(b"partial")
    arr = asset_cache.mmap_derived("a", src, lambda: np.arange(4))
    assert len(arr) == 4
    gens = [f for f in os.listdir(cache) if f.startswith("a-") and f.endswith(".npy")]
    assert len(gens) == 1  # old generation pruned
    assert fresh_tmp.exists()  # fresh tmp NOT pruned (could be in-flight)
