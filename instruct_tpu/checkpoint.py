"""Checkpoint / resume for long MCMC runs.

The reference has none — a crashed 1M-iteration run restarts from zero
(survey §5); its only related artifacts are `printseeds` (random.c:60-63,
never called) and warm-start S values from the `-i` file.  Here the full
(sampler state, streaming accumulators, step counter) pytree is saved on a
cadence via orbax, and resume is **bitwise**: step keys are counter-based
(`fold_in(chain_key, step_index)`), so replaying from a checkpoint produces
exactly the draws the uninterrupted run would have produced.

Format: leaves are keyed by their pytree *field path* (stable under adding
or reordering state fields), with a version marker in a sibling
``<step>.meta.json``.  Version-1 checkpoints (positional ``leaf_<i>`` keys,
no meta file) are still restorable as long as the pytree structure matches
the one that saved them.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:                      # pragma: no cover
    _HAVE_ORBAX = False

# 3: tetraploid latents (state.z, state.geno, Dataset.distinct) moved from
#    copy-interleaved to copy-major [N, 4L] layout and int8 storage; v<=2
#    tetraploid checkpoints are rejected (a silent restore would permute
#    allele copies).  Diploid checkpoints are layout-identical across 2-3.
# 4: adds states.loglik_marg and accums.{mean,mean_sq}.ll_marg (corrected-
#    DIC moments).  v3 checkpoints restore with those leaves kept at the
#    template value (0) — the DIC E-term then covers post-resume samples
#    only, which restore_checkpoint surfaces via the saved key list.
FORMAT_VERSION = 4


def _ckpt_path(directory: str, step: int) -> str:
    return os.path.join(os.path.abspath(directory), f"step_{step:012d}")


def _meta_path(directory: str, step: int) -> str:
    return _ckpt_path(directory, step) + ".meta.json"


def _leaf_key(path) -> str:
    """Stable string key for a pytree leaf: 'states.freq', 'accums.mean.q',
    '2' (positional for bare containers)."""
    s = jax.tree_util.keystr(path)
    s = re.sub(r"[^0-9A-Za-z]+", ".", s).strip(".")
    return s or "root"


def _flat_path_dict(payload: Any):
    """(key -> leaf) with field-path keys, plus (leaves, treedef, keys)."""
    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(payload)
    keys, leaves, seen = [], [], {}
    for path, leaf in path_leaves:
        k = _leaf_key(path)
        if k in seen:                   # collide only for exotic pytrees
            i = seen[k] = seen.get(k, 0) + 1
            k = f"{k}.{i}"
        else:
            seen[k] = 0
        keys.append(k)
        leaves.append(leaf)
    d = {k: x for k, x in zip(keys, leaves)
         if not (hasattr(x, "size") and x.size == 0)}
    return d, keys, leaves, treedef


def save_checkpoint(directory: str, step: int, payload: Any) -> None:
    """Persist the (states, accums, ...) pytree at `step`.

    The pytree is stored as a flat field-path-keyed leaf dict; zero-size
    leaves (mode-unused state fields, which orbax refuses) are skipped and
    re-grafted from the caller's template at restore time.
    """
    path = _ckpt_path(directory, step)
    d, keys, _, _ = _flat_path_dict(payload)
    if _HAVE_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        ckpt.save(path, d, force=True)
        ckpt.wait_until_finished()
    else:                              # pragma: no cover
        os.makedirs(path, exist_ok=True)
        np.savez(os.path.join(path, "state.npz"),
                 **{k: np.asarray(v) for k, v in d.items()})
    with open(_meta_path(directory, step), "w") as fh:
        json.dump({"format_version": FORMAT_VERSION, "step": step,
                   "keys": keys}, fh)


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = []
    for name in os.listdir(directory):
        if name.startswith("step_") and not name.endswith(".meta.json"):
            try:
                steps.append(int(name[5:]))
            except ValueError:
                pass
    return max(steps) if steps else None


def _format_version(directory: str, step: int) -> int:
    try:
        with open(_meta_path(directory, step)) as fh:
            return int(json.load(fh).get("format_version", 1))
    except (OSError, ValueError):
        return 1                       # round-1 checkpoints had no meta


def restore_checkpoint(directory: str, step: int, template: Any) -> Any:
    """Restore the payload saved at `step`, shaped like `template`."""
    path = _ckpt_path(directory, step)
    version = _format_version(directory, step)
    _, keys, leaves, treedef = _flat_path_dict(template)
    if version < 3:
        for k, x in zip(keys, leaves):
            if k.endswith("geno") and hasattr(x, "size") and x.size:
                raise ValueError(
                    f"checkpoint at {path} is format v{version}: tetraploid "
                    "latents used the copy-interleaved layout, which this "
                    "version stores copy-major — restoring would permute "
                    "allele copies; rerun from the initial state")
    if version < 2:                    # legacy positional keys
        keys = [f"leaf_{i}" for i in range(len(leaves))]
    saved_keys = None
    try:
        with open(_meta_path(directory, step)) as fh:
            saved_keys = set(json.load(fh).get("keys", []) or []) or None
    except (OSError, ValueError):
        pass
    if _HAVE_ORBAX:
        ckpt = ocp.StandardCheckpointer()
        abstract = {k: jax.ShapeDtypeStruct(np.shape(x), x.dtype)
                    for k, x in zip(keys, leaves)
                    if not (hasattr(x, "size") and x.size == 0)
                    and (saved_keys is None or k in saved_keys)}
        d = ckpt.restore(path, abstract)
    else:                              # pragma: no cover
        d = dict(np.load(os.path.join(path, "state.npz")))
    new_leaves = [d.get(k, t) for k, t in zip(keys, leaves)]
    return jax.tree.unflatten(treedef, new_leaves)
