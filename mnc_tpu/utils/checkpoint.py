"""Checkpoint / resume — ≙ reference snapshot machinery.

The reference saved ``.caffemodel`` (weights) + ``.solverstate`` (momentum,
iter) from ``SolverWrapper.snapshot`` (lib/caffeWrapper/SolverWrapper.py),
with one crucial subtlety: before saving, the ``bbox_pred`` layer weights were
**un-normalized** (scaled by the bbox target stds and shifted by the means) so
the exported model predicts raw deltas at test time, then restored for
continued training (SURVEY.md §5.4).

Here checkpoints are orbax: the full TrainState (params + momentum + step) is
saved/restored losslessly, normalization constants ride along in metadata,
and :func:`export_params` reproduces the reference's fold-the-stats-into-
the-weights behavior for deployment-style export.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, state, step: int | None = None,
                    keep: int = 5) -> str:
    """Save TrainState to <directory>/ckpt_<step>; prunes old checkpoints."""
    step = int(state.step) if step is None else step
    directory = osp.abspath(directory)  # orbax requires absolute paths
    os.makedirs(directory, exist_ok=True)
    path = osp.join(directory, f"ckpt_{step:08d}")
    _ckptr().save(path, jax.device_get(state), force=True)
    _prune(directory, keep)
    return path


def _is_complete(directory: str, name: str) -> bool:
    return name.startswith("ckpt_") and not name.endswith("-tmp")


def _prune(directory: str, keep: int):
    import shutil

    names = os.listdir(directory)
    cks = sorted(d for d in names if _is_complete(directory, d))
    stale = [d for d in names if d.startswith("ckpt_") and d.endswith("-tmp")]
    for d in cks[:-keep] + stale:
        shutil.rmtree(osp.join(directory, d), ignore_errors=True)


def latest_checkpoint(directory: str) -> str | None:
    directory = osp.abspath(directory)
    if not osp.isdir(directory):
        return None
    cks = sorted(d for d in os.listdir(directory) if _is_complete(directory, d))
    return osp.join(directory, cks[-1]) if cks else None


def restore_checkpoint(path: str, template):
    """Restore into the structure of ``template`` (a TrainState/pytree)."""
    restored = _ckptr().restore(osp.abspath(path), item=jax.device_get(template))
    return jax.tree.map(jnp.asarray, restored)


def restore_latest(directory: str, template):
    """Auto-resume-from-latest (the failure-recovery story, SURVEY.md §5.3)."""
    path = latest_checkpoint(directory)
    if path is None:
        return template, 0
    state = restore_checkpoint(path, template)
    return state, int(state.step)


# --------------------------------------------------------------------------- #
# Export with bbox un-normalization (reference snapshot semantics)
# --------------------------------------------------------------------------- #


def export_params(params: Any, bbox_means, bbox_stds) -> Any:
    """Fold bbox-target normalization into the bbox_pred fc weights.

    After this, the classify head emits UN-normalized deltas, exactly like a
    reference ``.caffemodel`` written by ``SolverWrapper.snapshot``; run the
    model with ``stage_bridge(..., bbox_pred_normalized=False)`` semantics.
    kernel' = kernel * stds (per output), bias' = bias * stds + means.
    """
    params = jax.device_get(params)
    means = np.asarray(bbox_means, np.float32)
    stds = np.asarray(bbox_stds, np.float32)

    def fold(tree):
        bb = tree["params"]["classify_head"]["bbox_pred"]
        k, b = np.asarray(bb["kernel"]), np.asarray(bb["bias"])
        n_out = k.shape[-1]
        stds_full = np.tile(stds, n_out // 4)
        means_full = np.tile(means, n_out // 4)
        bb["kernel"] = k * stds_full[None, :]
        bb["bias"] = b * stds_full + means_full
        return tree

    return fold(jax.tree.map(np.asarray, params))


def renormalize_bbox_pred(params: Any, bbox_means, bbox_stds) -> Any:
    """Inverse of :func:`export_params` — pull the bbox stats back OUT.

    Reference ``.caffemodel`` snapshots carry bbox_pred weights with the
    target normalization folded in (they predict raw deltas).  Training
    assumes NORMALIZED deltas (targets are normalized, the stage bridge
    de-normalizes), so fine-tuning from a snapshot must first divide the
    stats back out: kernel' = kernel / stds, bias' = (bias - means) / stds.
    """
    params = jax.device_get(params)
    means = np.asarray(bbox_means, np.float32)
    stds = np.asarray(bbox_stds, np.float32)

    def unfold(tree):
        bb = tree["params"]["classify_head"]["bbox_pred"]
        k, b = np.asarray(bb["kernel"]), np.asarray(bb["bias"])
        n_out = k.shape[-1]
        stds_full = np.tile(stds, n_out // 4)
        means_full = np.tile(means, n_out // 4)
        bb["kernel"] = k / stds_full[None, :]
        bb["bias"] = (b - means_full) / stds_full
        return tree

    return unfold(jax.tree.map(np.asarray, params))


def save_npz(path: str, params: Any, meta: dict | None = None) -> None:
    """Flat-name npz export (portable, ≙ .caffemodel role).

    ``meta`` entries are stored under ``__meta__/<key>`` — e.g.
    ``bbox_pred_normalized`` records whether the stats are still IN the
    regressor (True) or folded into the weights (False, export_params), so
    consumers can configure the stage bridge correctly (ADVICE r1)."""
    flat = {}

    def walk(prefix, tree):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(f"{prefix}/{k}" if prefix else k, v)
        else:
            flat[prefix] = np.asarray(tree)

    walk("", jax.device_get(params))
    for k, v in (meta or {}).items():
        flat[f"__meta__/{k}"] = np.asarray(v)
    np.savez(path, **flat)


def load_npz(path: str) -> dict:
    """Inverse of save_npz: nested dict from flat names (metadata stripped —
    use :func:`npz_meta` for it)."""
    out: dict = {}
    with np.load(path) as data:
        for name in data.files:
            if name.startswith("__meta__/"):
                continue
            parts = name.split("/")
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = data[name]
    return out


def arch_for_npz(path: str, arch):
    """Return ``arch`` adjusted to the npz's recorded regressor convention.

    Exported-with-folded-stats params (bbox_pred_normalized=False) need the
    stage bridge NOT to re-apply the normalization stds/means; files without
    metadata are assumed normalized (training convention)."""
    normalized = bool(npz_meta(path).get("bbox_pred_normalized", True))
    if normalized == arch.bbox_pred_normalized:
        return arch
    import dataclasses

    return dataclasses.replace(arch, bbox_pred_normalized=normalized)


def npz_meta(path: str) -> dict:
    """The ``__meta__/*`` entries of an npz export ({} for older files)."""
    out = {}
    with np.load(path) as data:
        for name in data.files:
            if name.startswith("__meta__/"):
                v = data[name]
                out[name.split("/", 1)[1]] = v.item() if v.ndim == 0 else v
    return out


def parse_remap(pairs) -> dict:
    """['old=new', ...] (the --remap CLI form) → {old: new}."""
    out = {}
    for p in pairs or []:
        if "=" not in p:
            raise ValueError(f"--remap entries are old=new, got {p!r}")
        old, new = p.split("=", 1)
        out[old] = new
    return out


def load_import_weights(caffemodel_path, npz_path, arch, params, remap=None,
                        make_params=None):
    """Shared --caffemodel / --npz handling for the tool CLIs.

    Returns (params, arch) — the arch may be a replacement configured for the
    imported weights: caffemodels flip BOTH bbox_pred_normalized (snapshot
    weights are un-normalized) and suppress_untrainable_anchors (the
    reference ProposalLayer scored all anchors), and AUTO-CONFIGURE the
    fields derivable from blob shapes (MASK_SIZE 21 vs 28, num_classes,
    warp/fc dims — ``infer_arch_overrides``); npz files carry the
    normalization state as metadata.  Rebuild the model iff arch changed.
    ``remap`` ({source_layer: canonical_layer} or ['old=new', ...]) renames
    caffemodel layers before matching.  ``make_params(arch) -> params``
    re-initializes the param tree when auto-config changes head shapes;
    without it a shape-changing import fails loudly.
    """
    import dataclasses

    if caffemodel_path:
        from mnc_tpu.utils.caffemodel import (infer_arch_overrides,
                                              load_mnc_caffemodel,
                                              read_caffemodel)

        if isinstance(remap, (list, tuple)):
            remap = parse_remap(remap)
        blobs = read_caffemodel(caffemodel_path)
        named = ({remap.get(k, k): v for k, v in blobs.items()} if remap
                 else blobs)
        overrides = infer_arch_overrides(named)
        changes = {k: v for k, v in overrides.items()
                   if getattr(arch, k) != v}
        if changes:
            print(f"caffemodel auto-config: {changes} "
                  f"(was {({k: getattr(arch, k) for k in changes})})")
            arch = dataclasses.replace(arch, **changes)
            if make_params is None:
                raise ValueError(
                    f"caffemodel {caffemodel_path} needs arch overrides "
                    f"{changes} but no make_params re-init hook was given")
            params = make_params(arch)
        params = load_mnc_caffemodel(caffemodel_path, params, remap=remap,
                                     blobs=blobs)
        arch = dataclasses.replace(arch, bbox_pred_normalized=False,
                                   suppress_untrainable_anchors=False)
        print(f"loaded reference weights from {caffemodel_path} "
              "(stage-bridge de-norm off; anchor-type suppression off)")
    elif npz_path:
        params = load_npz(npz_path)
        new_arch = arch_for_npz(npz_path, arch)
        if new_arch is not arch:
            print("npz has bbox stats folded in; stage bridge de-norm off")
        arch = new_arch
    return params, arch
