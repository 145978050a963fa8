"""On-disk cache of compiled XLA executables (AOT compile cache).

Every eval/serving process pays a full MVSNet jit compile (~20 s on the
live chip) because JAX's persistent compilation cache does not engage
under the axon TPU plugin (verified in docs/ROUND3_NOTES.md). This module
caches the *compiled executable itself* via
``jax.experimental.serialize_executable``: the first process lowers +
compiles and serializes the executable to disk; later processes
deserialize and skip both tracing and XLA compilation.

The reference has no comparable layer — its model load is a plain
torch.load (/root/reference/eval.py:308-316) and cuDNN autotunes per
process. Here the cache is keyed by everything that shapes the lowered
program: jax version, device platform/kind, a caller-supplied config
object (model flags, batch geometry), and the shape/dtype tree of the
example arguments.

Entries are self-invalidating: a deserialize failure (corrupt file, jax
upgrade, different device) falls back to a fresh compile and rewrites the
entry. Writes are atomic (tmp + rename) so concurrent processes never see
torn files.

The cache is active ONLY on the platforms in :data:`CACHE_PLATFORMS`
(default TPU). XLA:CPU AOT results are NOT safe to reload in a fresh
process even on the same host: the loader warns about compile-side feature
flags (+prefer-no-scatter/+prefer-no-gather) it cannot match and then
SEGFAULTS executing the big MVSNet program (verified on this container,
2026-08-19). On CPU, callers transparently get the plain jitted function.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import time
from typing import Any, Callable

_VERSION = 1  # bump to invalidate every cache entry

# Platforms where executable caching is safe. Tests monkeypatch this to
# ("cpu",) to exercise the cache mechanics in-process (in-process CPU
# reload works; it is only the fresh-process CPU reload that segfaults).
CACHE_PLATFORMS: tuple = ("tpu",)


def _arg_spec(args: Any) -> str:
    """Canonical string of the shape/dtype tree of ``args``."""
    import jax
    import numpy as np

    def leaf(x):
        if hasattr(x, "shape") and hasattr(x, "dtype"):
            return (tuple(x.shape), str(x.dtype))
        return ("py", repr(type(x)), repr(x))

    leaves, treedef = jax.tree_util.tree_flatten(args)
    del np
    return repr((treedef, [leaf(x) for x in leaves]))


def _host_cpu_tag() -> str:
    """CPU model tag: XLA:CPU AOT entries embed the compile machine's
    feature set and the loader only WARNS (risking SIGILL) on mismatch, so
    CPU-platform cache keys must be per-CPU-model (same issue as the
    persistent compile cache dir in tests/conftest.py)."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("model name"):
                    return line.split(":", 1)[1].strip()
    except OSError:
        pass
    return "unknown-cpu"


def cache_key(key_obj: Any, args: Any) -> str:
    import jax

    dev = jax.devices()[0]
    raw = "|".join(
        [
            str(_VERSION),
            jax.__version__,
            dev.platform,
            getattr(dev, "device_kind", "?"),
            _host_cpu_tag() if dev.platform == "cpu" else "",
            str(jax.device_count()),
            repr(key_obj),
            _arg_spec(args),
        ]
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


def load_or_compile(
    jitted_fn: Callable,
    cache_dir: str | None,
    key_obj: Any,
    args: tuple,
    label: str = "fn",
) -> Callable:
    """Return a compiled executable for ``jitted_fn`` at ``args``' shapes.

    With ``cache_dir`` set, tries to deserialize a cached executable first
    (skipping trace + XLA compile); on miss, compiles and writes the entry.
    With ``cache_dir`` None — or on a platform not in CACHE_PLATFORMS —
    just returns ``jitted_fn`` (normal jit path).

    The returned callable has the same calling convention as ``jitted_fn``
    but is shape-specialized: calling it with different shapes is an error
    (callers in this repo pad to a single compiled shape already).
    """
    import jax

    if cache_dir is None or jax.devices()[0].platform not in CACHE_PLATFORMS:
        return jitted_fn

    from jax.experimental import serialize_executable

    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, cache_key(key_obj, args) + ".aotx")

    if os.path.exists(path):
        t0 = time.time()
        try:
            with open(path, "rb") as f:
                entry = pickle.load(f)
            # deserialize_and_load defaults execution_devices to ALL local
            # devices; a 1-device program loaded on an 8-device host would
            # then demand 8 input shards. Pin to the compile-time count.
            n_dev = entry["n_devices"]
            loaded = serialize_executable.deserialize_and_load(
                *entry["blob"], execution_devices=jax.devices()[:n_dev]
            )
            # Trial execution: deserialize can succeed yet the executable
            # still be unrunnable (observed on XLA:CPU — "Buffer Definition
            # Event ... not found" / SIGSEGV-adjacent failures surface only
            # at execution). Run it once on the real args and only then
            # trust it; the extra launch is tiny next to the compile saved.
            jax.block_until_ready(loaded(*args))
            print(
                f"aot cache hit: {label} loaded+validated in "
                f"{time.time() - t0:.2f}s ({os.path.basename(path)})"
            )
            return loaded
        except Exception as e:  # stale/corrupt/foreign-device entry
            print(f"aot cache entry unusable ({e!r}); recompiling {label}")

    t0 = time.time()
    compiled = jitted_fn.lower(*args).compile()
    t_compile = time.time() - t0
    try:
        blob = serialize_executable.serialize(compiled)
        n_devices = len(compiled.runtime_executable().local_devices())
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump({"blob": blob, "n_devices": n_devices}, f)
        os.replace(tmp, path)
        print(
            f"aot cache miss: {label} compiled in {t_compile:.2f}s, "
            f"cached ({os.path.basename(path)})"
        )
    except Exception as e:  # serialization unsupported on this backend
        print(f"aot cache: could not serialize {label} ({e!r}); "
              f"compiled in {t_compile:.2f}s, not cached")
    return compiled


class AotGate:
    """Lazy per-shape gate around a jitted function.

    The first call resolves a compiled executable for the observed arg
    shapes through :func:`load_or_compile`; later calls go straight to it.
    Call sites that already guarantee a single compiled shape (eval stage A
    pads trailing batches) use this as a drop-in for the jitted function.
    """

    def __init__(self, jitted_fn, cache_dir: str | None, key_obj: Any,
                 label: str = "fn") -> None:
        self._jitted = jitted_fn
        self._cache_dir = cache_dir
        self._key_obj = key_obj
        self._label = label
        self._compiled: Callable | None = None

    def __call__(self, *args):
        if self._compiled is None:
            self._compiled = load_or_compile(
                self._jitted, self._cache_dir, self._key_obj, args,
                label=self._label,
            )
        return self._compiled(*args)
