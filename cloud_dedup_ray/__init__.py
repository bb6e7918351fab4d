"""cloud_dedup_ray — a Ray-Data-native data-processing / dedup engine.

A from-scratch rebuild of the capabilities of ``ndany/cloud-dedup``
(reference: /root/reference/src/cloud_duplicate_analyzer.py) expressed
as idiomatic ``ray.data.Dataset`` pipelines:

* **Exact tier** (reference parity): blocking on ``(name, size)`` →
  content-hash verification → duplicate / conflict / symlink groups,
  folder analytics, unique counts — the full ``analyze()`` surface of
  the reference, re-expressed as ``map_batches`` / ``groupby`` /
  ``map_groups`` over zero-copy Arrow blocks.
* **Near-dup tier** (north star): normalize → k-shingles → 128-perm
  MinHash (actor pool) → LSH bands (salted groupby) → candidate pairs →
  union-find → cluster ids, plus a suffix-array substring pass for
  exact containment that MinHash misses.
* **Training-data ops**: exact/MinHash/SimHash/n-gram/embedding dedup,
  ANN similarity search, language-ID, quality scoring, token counting,
  document fingerprinting, multimodal (binary-column) plumbing.

Library code never calls ``ray.init`` / ``ray.shutdown`` — the driver
owns the Ray session (see ``__ray_entry__.py``).
"""

def _stub_fsspec_http() -> None:
    """Pre-resolve the ``fsspec.implementations.http`` lazy import that
    Ray's ``read_parquet`` path-resolution performs on every call.

    Without aiohttp installed the import always fails; a FAILED import
    is never cached, so two driver threads calling ``read_parquet``
    concurrently can race inside the module machinery — one thread sees
    the partially-initialized module and gets a bare ``ImportError``
    ("cannot import name 'HTTPFileSystem'"), which Ray's
    ``except ModuleNotFoundError`` does NOT catch. Installing a benign
    stub module once makes the import cached and race-free; the stub
    class never matches a real filesystem instance, so
    ``_is_http_filesystem`` keeps returning False exactly as before.
    """
    try:
        import fsspec.implementations.http  # noqa: F401
    except (ImportError, ModuleNotFoundError):
        import sys
        import types

        try:
            import fsspec.implementations as _impl
        except Exception:
            return

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:
            """Sentinel installed by cloud_dedup_ray (aiohttp absent)."""

            def __init__(self, *a, **kw):
                raise ImportError(
                    "fsspec's real HTTPFileSystem requires aiohttp, which "
                    "is not installed; this stub module was installed by "
                    "cloud_dedup_ray to make the failed import cached and "
                    "race-free (set CLOUD_DEDUP_RAY_NO_TWEAKS=1 to disable)."
                )

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
        _impl.http = mod


def _tune_malloc() -> None:
    """Keep large allocations in the process heap instead of per-call
    mmap/munmap.

    glibc services allocations above MMAP_THRESHOLD (128 KiB) with a
    fresh mmap and returns them to the OS on free. On this class of
    lazily-backed VMs, first-touch page faults run at ~100 MB/s, so
    every multi-hundred-MB numpy temporary (signature gathers, shuffle
    buffers) pays the fault cost AGAIN on each allocation — measured
    10–30× slowdowns with run-to-run variance. Raising the mmap and
    trim thresholds makes the heap retain and reuse those pages: the
    fault cost is paid once per process. No-op on non-glibc platforms.
    """
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except (OSError, AttributeError):
        pass


# Both tweaks must run in EVERY process that uses the library — Ray
# workers import this package when unpickling stage callables, and the
# malloc tuning is exactly where the numpy temporaries live — so they
# are applied at import, with an env-var escape hatch for co-resident
# code that doesn't want process-global side effects.
import os as _os  # noqa: E402

if _os.environ.get("CLOUD_DEDUP_RAY_NO_TWEAKS") != "1":
    _tune_malloc()
    _stub_fsspec_http()

from cloud_dedup_ray.config import DedupConfig  # noqa: E402

__all__ = ["DedupConfig"]
__version__ = "0.1.0"
