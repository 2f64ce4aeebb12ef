"""Cross-worker scene cache (reference `pointcept/utils/cache.py:20-56`).

The reference memoizes decoded scenes in /dev/shm via SharedArray. Here we
cache each scene as an uncompressed .npz in a shared cache dir (tmpfs when
available) and memory-map it on read, giving the same
decode-once-read-many-times behaviour without extra dependencies.
"""

from __future__ import annotations

import hashlib
import os
from typing import Callable, Dict

import numpy as np

_DEFAULT_DIR = os.environ.get(
    "CDSEG_CACHE_DIR",
    "/dev/shm/cdsegnet_cache" if os.path.isdir("/dev/shm") else "/tmp/cdsegnet_cache",
)


def shared_dict(name: str, loader: Callable[[], Dict[str, np.ndarray]],
                cache_dir: str = _DEFAULT_DIR) -> Dict[str, np.ndarray]:
    """Return the cached arrays for ``name``, populating on first use."""
    os.makedirs(cache_dir, exist_ok=True)
    key = hashlib.sha1(name.encode()).hexdigest()[:16]
    path = os.path.join(cache_dir, f"{key}.npz")
    if not os.path.exists(path):
        data = loader()
        arrays = {k: np.asarray(v) for k, v in data.items()
                  if isinstance(v, np.ndarray) or np.isscalar(v)}
        tmp = path + f".tmp{os.getpid()}"
        np.savez(tmp, **arrays)
        os.replace(tmp, path)
    loaded = np.load(path, mmap_mode="r", allow_pickle=False)
    return {k: loaded[k] for k in loaded.files}


def clear_cache(cache_dir: str = _DEFAULT_DIR) -> None:
    if os.path.isdir(cache_dir):
        for f in os.listdir(cache_dir):
            try:
                os.remove(os.path.join(cache_dir, f))
            except OSError:
                pass
