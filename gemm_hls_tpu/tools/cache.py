"""Compiled-artifact packaging — the ``build_manager.py package/unpackage``
port (reference ``scripts/build_manager.py:434-575``).

The reference's expensive build artifact is the FPGA bitstream; it packages
compiled ``.xclbin`` + reports into a tarball so another machine can skip the
hours-long HLS+P&R flow.  The TPU analogue is XLA's persistent compilation
cache: Mosaic/XLA executables keyed by (program, compiler version, chip).
This module enables the cache, and packages/unpackages it as a tarball so a
fleet can reuse one machine's compiles.

    from gemm_hls_tpu.tools.cache import enable_persistent_cache, package
    enable_persistent_cache("/path/to/cache")
    ... run / sweep ...
    package("kernels_v5e.tar.gz")
"""

from __future__ import annotations

import os
import tarfile
from pathlib import Path
from typing import Optional

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/gemm_hls_tpu/xla_cache")

_enabled_dir: Optional[str] = None


def enable_persistent_cache(cache_dir: Optional[str] = None,
                            min_compile_time_secs: float = 1.0) -> str:
    """Turn on XLA's persistent compilation cache for this process."""
    global _enabled_dir
    import jax

    cache_dir = cache_dir or DEFAULT_CACHE_DIR
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except AttributeError:
        pass
    _enabled_dir = cache_dir
    return cache_dir


def cache_dir() -> Optional[str]:
    return _enabled_dir


def package(archive_path: str, cache_dir_: Optional[str] = None) -> str:
    """Tar the compilation cache for transfer to another machine
    (``build_manager.py package`` analogue)."""
    d = cache_dir_ or _enabled_dir or DEFAULT_CACHE_DIR
    d = Path(d)
    if not d.is_dir():
        raise FileNotFoundError(f"no compilation cache at {d}")
    with tarfile.open(archive_path, "w:gz") as tar:
        # recursive=False: rglob already enumerates every path, and the
        # default recursive add would store each file once per ancestor
        # directory entry.
        for f in sorted(d.rglob("*")):
            tar.add(f, arcname=str(f.relative_to(d)), recursive=False)
    return archive_path


def unpackage(archive_path: str, cache_dir_: Optional[str] = None) -> str:
    """Extract a packaged cache and enable it
    (``build_manager.py unpackage`` analogue)."""
    d = Path(cache_dir_ or DEFAULT_CACHE_DIR)
    d.mkdir(parents=True, exist_ok=True)
    with tarfile.open(archive_path, "r:gz") as tar:
        tar.extractall(d, filter="data")
    return enable_persistent_cache(str(d))
