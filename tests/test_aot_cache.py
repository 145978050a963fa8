"""Compiled-executable cache (utils/aot_cache.py).

Every eval/serving process otherwise pays a full jit compile (the JAX
persistent compile cache does not engage under the axon TPU plugin, see
docs/ROUND3_NOTES.md); the AOT cache serializes the compiled executable so
later processes skip trace + compile. The reference surface this
accelerates is the per-process model load at /root/reference/eval.py:308-316.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scene_3dreconstruction_mvsnet_tpu.utils import aot_cache
from scene_3dreconstruction_mvsnet_tpu.utils.aot_cache import (
    AotGate,
    cache_key,
)


@pytest.fixture(autouse=True)
def _enable_cpu_cache(monkeypatch):
    """The cache is TPU-only in production (fresh-process CPU reloads of
    XLA:CPU AOT results segfault — see the module docstring); tests enable
    it on CPU to exercise the mechanics in-process, where reload is safe."""
    monkeypatch.setattr(aot_cache, "CACHE_PLATFORMS", ("cpu", "tpu"))


def test_aot_gate_roundtrip(tmp_path):
    """First call compiles + writes one entry; a fresh gate loads it and
    produces identical results."""
    d = str(tmp_path)
    f = jax.jit(lambda x, y: jnp.tanh(x @ y) + 1.0)
    x = jnp.asarray(np.random.RandomState(0).randn(8, 128), jnp.float32)

    g1 = AotGate(f, d, ("k", 1), label="t")
    y1 = np.asarray(g1(x, x.T @ x / 128))
    files = [p for p in os.listdir(d) if p.endswith(".aotx")]
    assert len(files) == 1

    g2 = AotGate(f, d, ("k", 1), label="t")
    y2 = np.asarray(g2(x, x.T @ x / 128))
    np.testing.assert_array_equal(y1, y2)
    assert [p for p in os.listdir(d) if p.endswith(".aotx")] == files


def test_cache_key_sensitivity():
    """Key changes with config object, arg shapes, and dtypes — the three
    things that change the lowered program."""
    x32 = jnp.zeros((4, 8), jnp.float32)
    x16 = jnp.zeros((4, 8), jnp.bfloat16)
    y32 = jnp.zeros((8, 8), jnp.float32)
    base = cache_key("cfg", (x32,))
    assert cache_key("cfg2", (x32,)) != base
    assert cache_key("cfg", (y32,)) != base
    assert cache_key("cfg", (x16,)) != base
    assert cache_key("cfg", (x32,)) == base


def test_corrupt_entry_falls_back(tmp_path):
    """A torn/corrupt cache file must recompile, not crash."""
    d = str(tmp_path)
    f = jax.jit(lambda x: x * 3.0)
    x = jnp.ones((4, 4), jnp.float32)
    g = AotGate(f, d, "k", label="t")
    g(x)
    (path,) = [os.path.join(d, p) for p in os.listdir(d) if p.endswith(".aotx")]
    with open(path, "wb") as fh:
        fh.write(b"not a pickle")
    g2 = AotGate(f, d, "k", label="t")
    np.testing.assert_array_equal(np.asarray(g2(x)), np.full((4, 4), 3.0))


def test_cpu_platform_bypasses_cache(tmp_path, monkeypatch):
    """With the production platform list (TPU only), a CPU session must get
    the plain jitted function back and write nothing to disk."""
    monkeypatch.setattr(aot_cache, "CACHE_PLATFORMS", ("tpu",))
    f = jax.jit(lambda x: x + 1)
    g = AotGate(f, str(tmp_path), "k", label="t")
    np.testing.assert_array_equal(
        np.asarray(g(jnp.zeros((2, 2)))), np.ones((2, 2))
    )
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".aotx")]


def test_fuse_scan_aot_parity(tmp_path):
    """fuse_scan with aot_cache must match the plain jit path bit-for-bit
    and serve the second scan from the cache entry."""
    from scene_3dreconstruction_mvsnet_tpu.eval.filtering import fuse_scan

    rng = np.random.RandomState(1)
    V, H, W = 3, 16, 24
    f = 30.0
    Ks = np.tile(
        np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32),
        (V, 1, 1),
    )
    Es = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    for v in range(V):
        Es[v, 0, 3] = 2.0 * v  # translated rig
    depths = np.full((V, H, W), 100.0, np.float32) + rng.randn(V, H, W).astype(
        np.float32
    )
    confs = rng.rand(V, H, W).astype(np.float32)
    pair_data = [(0, [1, 2]), (1, [0, 2]), (2, [0, 1])]
    kw = dict(NviewFilter=2, photomask=0.5, geomask=1,
              condmask_pixel=2.0, condmask_depth=0.05)

    plain = fuse_scan(depths, confs, Ks, Es, pair_data, [0, 1, 2], **kw)
    aot1 = fuse_scan(depths, confs, Ks, Es, pair_data, [0, 1, 2],
                     aot_cache=str(tmp_path), **kw)
    files = [p for p in os.listdir(tmp_path) if p.endswith(".aotx")]
    assert len(files) == 1
    aot2 = fuse_scan(depths, confs, Ks, Es, pair_data, [0, 1, 2],
                     aot_cache=str(tmp_path), **kw)
    for a, b in zip(plain, aot1):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    for a, b in zip(aot1, aot2):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
