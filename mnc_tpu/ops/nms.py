"""On-device fixed-shape NMS.

TPU-native replacement for the reference's NMS stack (``lib/nms/cpu_nms.pyx``,
``lib/nms/gpu_nms.pyx`` + ``nms_kernel.cu``, dispatched by
``lib/nms/nms_wrapper.py``): same greedy-NMS selections, but computed entirely
on-device over a padded top-K working set, inside jit — eliminating the
GPU→host→GPU round-trip the reference paid inside every forward pass
(SURVEY.md §3.1).

Algorithm — exact greedy NMS as a fixpoint iteration
----------------------------------------------------
Let boxes be sorted by descending score and ``S[i, j] = (IoU > thresh) & (i < j)``
("i suppresses j").  Greedy NMS is the unique solution of

    keep[j] = not any_i ( keep[i] & S[i, j] )          (*)

(unique by induction over j).  Define F(keep)[j] as the RHS of (*).  F is
antitone, and iterating it from all-True converges to the greedy solution:
after d iterations every box whose suppression-chain depth is <= d has its
final value (box 0 is kept at once; a depth-d box's deciders are stable after
d-1 iterations).  Chain depth is bounded by K but in practice tiny (< 10), so a
``lax.while_loop`` with a convergence test runs a handful of fully-vectorized
(K, K) steps instead of the K sequential steps of the classic scan — this is
the map from the reference's inherently-sequential CUDA kernel to a
latency-friendly XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mnc_tpu.ops.bbox import bbox_overlaps


def _suppression_matrix(boxes: jnp.ndarray, valid: jnp.ndarray, thresh) -> jnp.ndarray:
    """S[i, j] = True iff box i (higher score, valid) suppresses box j."""
    k = boxes.shape[0]
    iou = bbox_overlaps(boxes, boxes)
    upper = jnp.triu(jnp.ones((k, k), dtype=bool), k=1)  # i < j
    return (iou > thresh) & upper & valid[:, None]


def nms_fixed(boxes: jnp.ndarray, valid: jnp.ndarray, thresh) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes.

    Args:
      boxes: (K, 4), already sorted by descending score (ties broken by index).
      valid: (K,) bool — padding mask; invalid boxes neither keep nor suppress.
      thresh: IoU threshold.

    Returns:
      (K,) bool keep mask (False wherever ``valid`` is False).  Identical
      selections to the reference ``cpu_nms``/``gpu_nms``.
    """
    k = boxes.shape[0]
    s = _suppression_matrix(boxes, valid, thresh)
    s_f = s.astype(jnp.float32)

    def cond(state):
        it, keep, changed = state
        return changed & (it < k)

    def body(state):
        it, keep, _ = state
        # keep_new[j] = not any_i keep[i] & S[i,j]  — one (K,K)x(K,) reduce.
        suppressed = (keep.astype(jnp.float32) @ s_f) > 0.0
        keep_new = valid & ~suppressed
        return it + 1, keep_new, jnp.any(keep_new != keep)

    # Derive the scalar carry inits from `valid` so their device-varying type
    # matches the loop body under shard_map (jax vma typing).
    it0 = jnp.sum(valid.astype(jnp.int32)) * 0
    changed0 = jnp.any(valid) | True
    _, keep, _ = jax.lax.while_loop(cond, body, (it0, valid, changed0))
    return keep


def nms_tiled(boxes: jnp.ndarray, valid: jnp.ndarray, thresh, top_n: int,
              chunk: int = 1024) -> jnp.ndarray:
    """Greedy NMS over score-sorted boxes at reference-scale working sets.

    ``nms_fixed`` materializes the (K, K) suppression matrix — 576 MB of f32
    at the reference's pre-NMS K=12000.  This variant is EXACT greedy NMS with
    O(chunk² + chunk·top_n) memory: scan score-ordered chunks; each chunk is
    first suppressed against the buffer of already-kept boxes, then resolved
    internally with the fixpoint iteration.  Only the first ``top_n`` keeps
    can reach the output, so the kept-buffer is bounded by ``top_n`` —
    selections up to rank ``top_n`` are identical to ``nms_fixed``/the
    reference ``gpu_nms``.

    Returns a (K,) keep mask whose True entries are EXACTLY greedy NMS's
    first ``top_n`` keeps in score order (keeps past the buffer capacity are
    clamped to False — the mask never exceeds ``top_n`` Trues).
    """
    k = boxes.shape[0]
    pad = (-k) % chunk
    boxes_p = jnp.pad(boxes, ((0, pad), (0, 0)))
    valid_p = jnp.pad(valid, (0, pad))
    n_chunks = (k + pad) // chunk

    def step(state, xs):
        kept_boxes, kept_mask, count = state
        b, v = xs
        # suppression by keeps from earlier chunks
        iou_prev = bbox_overlaps(b, kept_boxes)
        sup = jnp.any((iou_prev > thresh) & kept_mask[None, :], axis=1)
        keep_c = nms_fixed(b, v & ~sup, thresh)
        # append this chunk's keeps to the buffer (in score order; overflow
        # beyond top_n is dropped — it can never reach the output)
        pos = count + jnp.cumsum(keep_c.astype(jnp.int32)) - 1
        slot = jnp.where(keep_c & (pos < top_n), pos, top_n)  # top_n = OOB
        kept_boxes = kept_boxes.at[slot].set(b, mode="drop")
        kept_mask = kept_mask.at[slot].set(True, mode="drop")
        count = count + jnp.sum(keep_c.astype(jnp.int32))
        # emit only keeps that made the buffer, so the public contract holds:
        # the mask's True entries are exactly greedy NMS's first top_n keeps
        return (kept_boxes, kept_mask, count), keep_c & (pos < top_n)

    init = (jnp.zeros((top_n, 4), boxes.dtype), jnp.zeros((top_n,), bool),
            jnp.sum(valid.astype(jnp.int32)) * 0)
    _, keeps = jax.lax.scan(
        step, init,
        (boxes_p.reshape(n_chunks, chunk, 4), valid_p.reshape(n_chunks, chunk)),
    )
    return keeps.reshape(-1)[:k]


def nms_indices(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    thresh,
    top_n: int,
    chunk: int | None = None,
    presorted: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sort by score, run NMS, return the top ``top_n`` kept indices.

    Args:
      boxes: (K, 4) in any order.
      scores: (K,).
      valid: (K,) bool.
      thresh: IoU threshold.
      top_n: static output count (padded with the last valid index).
      chunk: when set and K > chunk, use the tiled O(chunk²)-memory scan
        (reference working sets 6000/12000) instead of the (K, K) fixpoint.
      presorted: inputs are already in descending-score order with invalid
        entries trailing (e.g. straight out of ``lax.top_k``) — skips the
        argsort + permutation gathers.  Exact: a stable descending argsort
        of a descending sequence is the identity.  Besides dropping a
        K-length sort per call, this removes a conv→top_k→argsort→gather
        fused composition that faults the TPU worker at some canvas shapes
        (e.g. batch-8 608×816, 38×51 grid — kernel crash reproduced and
        bisected to exactly this composition; 640×1024 unaffected).

    Returns:
      (idx, keep_valid): idx (top_n,) int32 indices into the ORIGINAL arrays in
      descending-score order; keep_valid (top_n,) bool marks real entries.
    """
    if presorted:
        order = None
        sorted_boxes = boxes
        sorted_valid = valid
    else:
        neg_inf = jnp.finfo(scores.dtype).min
        masked_scores = jnp.where(valid, scores, neg_inf)
        order = jnp.argsort(-masked_scores)
        sorted_boxes = boxes[order]
        sorted_valid = valid[order]
    if chunk is not None and boxes.shape[0] > chunk:
        keep = nms_tiled(sorted_boxes, sorted_valid, thresh, top_n, chunk)
    else:
        keep = nms_fixed(sorted_boxes, sorted_valid, thresh)

    # Top-n kept, in score order: score kept entries by their (negated) rank.
    rank = jnp.arange(keep.shape[0], dtype=jnp.int32)
    sel_score = jnp.where(keep, -rank, jnp.iinfo(jnp.int32).min)
    top_score, top_pos = jax.lax.top_k(sel_score, top_n)
    keep_valid = top_score != jnp.iinfo(jnp.int32).min
    idx = top_pos if order is None else order[top_pos]
    # Padding entries point at the first box (always in-range).
    idx = jnp.where(keep_valid, idx, idx[0])
    return idx.astype(jnp.int32), keep_valid
