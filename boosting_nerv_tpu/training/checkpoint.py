"""Checkpoint save/restore.

Same artefact semantics as the reference (`model_latest.pth` per epoch with
{'epoch','state_dict','optimizer'}, auto-resume restoring the model but not
the optimiser — /root/reference/train_nerv_all.py:396-403, 286-298). Stored
as a pickle of numpy pytrees (portable, no torch)."""

from __future__ import annotations

import os
import pickle
import threading
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


_save_thread: Optional[threading.Thread] = None
_pending: Optional[tuple] = None
_save_lock = threading.Lock()


def _snap(x):
    """Device-side copy of array leaves. The train step donates its
    params/opt_state buffers, so a background saver must not hold the live
    arrays — it snapshots them on device (cheap) and downloads the copy."""
    return jnp.copy(x) if isinstance(x, jax.Array) else x


def wait_pending_saves():
    global _save_thread, _pending
    if _save_thread is not None:
        _save_thread.join()
        _save_thread = None
    with _save_lock:
        flush, _pending = _pending, None
    if flush is not None:
        save_checkpoint(*flush)


def _saver_loop(path, epoch, params, opt_state, extra):
    """Download+write, then drain the latest pending snapshot (if any)."""
    global _pending
    while True:
        save_checkpoint(path, epoch, params, opt_state, extra)
        with _save_lock:
            if _pending is None:
                return
            path, epoch, params, opt_state, extra = _pending
            _pending = None


def save_checkpoint_async(path: str, epoch: int, params: Any,
                          opt_state: Any = None,
                          extra: Optional[Dict] = None):
    """save_checkpoint off the training thread. On a tunneled backend the
    device->host download dominates (measured ~70 s per 720p save of
    params+opt_state, LONGER than a 38 s epoch). A save requested while a
    download is in flight lands in a latest-wins PENDING slot that the
    saver thread drains when it finishes, so `model_latest` converges to
    the newest snapshot instead of silently trailing; joining instead
    would gate every epoch on the tunnel bandwidth. `wait_pending_saves`
    flushes both the in-flight save and the pending slot."""
    global _save_thread, _pending
    snap_p = jax.tree_util.tree_map(_snap, params)
    snap_o = (jax.tree_util.tree_map(_snap, opt_state)
              if opt_state is not None else None)
    req = (path, epoch, snap_p, snap_o, extra)
    with _save_lock:
        if _save_thread is not None and _save_thread.is_alive():
            _pending = req  # latest wins
            return
        _pending = None  # a stale pending is older than this request
    _save_thread = threading.Thread(target=_saver_loop, args=req,
                                    daemon=True)
    _save_thread.start()


def save_checkpoint(path: str, epoch: int, params: Any,
                    opt_state: Any = None, extra: Optional[Dict] = None):
    payload = {"epoch": int(epoch), "params": _to_numpy(params)}
    if opt_state is not None:
        payload["opt_state"] = _to_numpy(opt_state)
    if extra:
        payload["extra"] = extra
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def tree_restore(template, saved):
    """Copy saved leaves into the template's structure (dtype-preserving)."""
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    s_leaves = jax.tree_util.tree_leaves(saved)
    if len(t_leaves) != len(s_leaves):
        raise ValueError(f"checkpoint leaf count {len(s_leaves)} != "
                         f"model leaf count {len(t_leaves)}")
    new = [np.asarray(s, dtype=t.dtype).reshape(t.shape)
           for t, s in zip(t_leaves, s_leaves)]
    return jax.tree_util.tree_unflatten(treedef, new)
