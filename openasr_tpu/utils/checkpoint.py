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
    _write_package(to_numpy_tree(pkg), path)


def _write_package(host_pkg: dict, path: str) -> None:
    """tmp-write + fsync + atomic rename.  The fsync BEFORE os.replace is
    what makes the pattern crash-durable: without it the filesystem may
    persist the rename but not the data, leaving a truncated last.pkg
    after power loss / hard preemption — exactly when the snapshot is
    needed."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(host_pkg, f, protocol=4)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    logger.info("Saved checkpoint %s", path)


class AsyncCheckpointer:
    """Orbax-style async save: device->host copy happens on the caller
    (cheap, and guarantees a consistent snapshot), the pickle+fsync happens
    on a background thread so the train loop never stalls on disk.  Writes
    are serialized; `wait()` drains before exit/averaging and RE-RAISES any
    writer failure — a swallowed ENOSPC would let the preemption path log
    'saved last.pkg' and exit with no usable snapshot."""

    def __init__(self):
        import atexit

        self._thread = None
        self._error = None
        # the writer is a daemon thread (so a hung disk never blocks
        # interpreter shutdown on crash paths), which means any exit that
        # skips train()'s wait() calls could kill it mid-pickle and drop
        # the newest checkpoint — drain pending writes at exit instead
        atexit.register(self._drain_at_exit)

    def save(self, pkg: dict, path: str) -> None:
        import threading

        host_pkg = to_numpy_tree(pkg)  # snapshot now, write later
        self.wait()

        def _write():
            try:
                _write_package(host_pkg, path)
            except BaseException as e:  # surfaced by the next wait()
                self._error = e

        self._thread = threading.Thread(target=_write, daemon=True)
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise RuntimeError("async checkpoint write failed") from err

    def _drain_at_exit(self) -> None:
        try:
            self.wait()
        except Exception:  # pragma: no cover - interpreter teardown
            logger.exception("async checkpoint write failed at exit")


def load_package(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def epoch_checkpoints(exp_dir: str) -> List[str]:
    """Epoch checkpoints sorted by epoch number.  Files matching the glob
    but not the `ep-NNNN.pkg` pattern (e.g. a hand-copied ep-best.pkg)
    are ignored rather than crashing cleanup/averaging."""
    paths = glob.glob(os.path.join(exp_dir, "ep-*.pkg"))
    numbered = [
        (int(m.group(1)), p)
        for p in paths
        if (m := EPOCH_RE.search(p)) is not None
    ]
    return [p for _, p in sorted(numbered)]


def cleanup_ckpt(exp_dir: str, num_last_ckpt_keep: int) -> None:
    """Keep only the newest N epoch checkpoints (reference: src/utils.py:43-49).

    Removal tolerates already-missing files: on a shared exp_dir several
    processes may race the same cleanup (the solver guards with is_host0,
    but external scripts can run concurrently too)."""
    paths = epoch_checkpoints(exp_dir)
    for p in paths[: max(0, len(paths) - num_last_ckpt_keep)]:
        try:
            os.remove(p)
        except FileNotFoundError:
            continue
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
    if num < 1:
        raise ValueError(
            f"average_last_ckpts: num must be >= 1, got {num} "
            "(num=0 would silently average EVERY checkpoint)"
        )
    paths = epoch_checkpoints(exp_dir)[-num:]
    pkg = average_packages(paths)
    save_package(pkg, out_path)
    return out_path
