"""Checkpoint save/load/cleanup/averaging.

Capability parity with the reference's torch.save packages
(reference: src/solvers/__init__.py:70-87), `utils.cleanup_ckpt`
(reference: src/utils.py:43-49), and `tools/avg_last_ckpts.py:35-55`.
Packages are nested dicts of NumPy arrays + plain configs, serialized with
pickle; filenames keep the reference's `ep-NNNN` / `last` scheme (with a
.pkg extension instead of .pt).
"""

from __future__ import annotations

import glob
import logging
import os
import pickle
import re
from typing import List

import jax
import numpy as np

logger = logging.getLogger(__name__)

EPOCH_RE = re.compile(r"ep-(\d+)\.pkg$")


def to_numpy_tree(tree):
    """Device arrays -> host numpy; non-array leaves (strings, ints in
    configs) pass through untouched."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree
    )


def save_package(pkg: dict, path: str) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(to_numpy_tree(pkg), f, protocol=4)
    os.replace(tmp, path)
    logger.info("Saved checkpoint %s", path)


class AsyncCheckpointer:
    """Orbax-style async save: device->host copy happens on the caller
    (cheap, and guarantees a consistent snapshot), the pickle+fsync happens
    on a background thread so the train loop never stalls on disk.  Writes
    are serialized; `wait()` drains before exit/averaging."""

    def __init__(self):
        import atexit
        import threading

        self._lock = threading.Lock()
        self._thread = None
        # the writer is a daemon thread (so a hung disk never blocks
        # interpreter shutdown on crash paths), which means any exit that
        # skips train()'s wait() calls could kill it mid-pickle and drop
        # the newest checkpoint — drain pending writes at exit instead
        atexit.register(self.wait)

    def save(self, pkg: dict, path: str) -> None:
        import threading

        host_pkg = to_numpy_tree(pkg)  # snapshot now, write later
        self.wait()

        def _write():
            with self._lock:
                tmp = path + ".tmp"
                with open(tmp, "wb") as f:
                    pickle.dump(host_pkg, f, protocol=4)
                os.replace(tmp, path)
                logger.info("Saved checkpoint %s", path)

        self._thread = threading.Thread(target=_write, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None


def load_package(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def epoch_checkpoints(exp_dir: str) -> List[str]:
    paths = glob.glob(os.path.join(exp_dir, "ep-*.pkg"))
    return sorted(paths, key=lambda p: int(EPOCH_RE.search(p).group(1)))


def cleanup_ckpt(exp_dir: str, num_last_ckpt_keep: int) -> None:
    """Keep only the newest N epoch checkpoints (reference: src/utils.py:43-49)."""
    paths = epoch_checkpoints(exp_dir)
    for p in paths[: max(0, len(paths) - num_last_ckpt_keep)]:
        os.remove(p)
        logger.info("Removed old checkpoint %s", p)


def average_packages(paths: List[str]) -> dict:
    """Average the model component states of several packages
    (reference: tools/avg_last_ckpts.py:35-55)."""
    assert paths, "No checkpoints to average"
    base = load_package(paths[0])
    model = base["model"] if "model" in base else base
    comps = model["components"]
    acc = jax.tree_util.tree_map(
        lambda x: x.astype(np.float64) if np.issubdtype(x.dtype, np.floating) else x,
        comps,
    )
    for p in paths[1:]:
        other = load_package(p)
        o = (other["model"] if "model" in other else other)["components"]
        acc = jax.tree_util.tree_map(
            lambda a, b: a + b if np.issubdtype(np.asarray(b).dtype, np.floating) else a,
            acc, o,
        )
    n = float(len(paths))
    avg = jax.tree_util.tree_map(
        lambda a: (a / n).astype(np.float32)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else a,
        acc,
    )
    model = dict(model)
    model["components"] = avg
    if "model" in base:
        base = dict(base)
        base["model"] = model
        return base
    return model


def average_last_ckpts(exp_dir: str, num: int, out_path: str) -> str:
    paths = epoch_checkpoints(exp_dir)[-num:]
    pkg = average_packages(paths)
    save_package(pkg, out_path)
    return out_path
