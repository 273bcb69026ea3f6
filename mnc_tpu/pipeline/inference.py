"""Jitted end-to-end inference: image → per-instance (box, class, score, mask).

This is the library API under both ``tools/demo.py`` and ``tools/test_net.py``
(SURVEY.md §3.4 — the reference's ``im_detect`` + the post-processing half of
``lib/caffeWrapper/TesterWrapper.py``): per-class NMS, mask voting
(``lib/nms/mv.pyx``), cross-class top-K, and full-canvas mask paste-back.
Everything after host image decode/resize executes in ONE XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from mnc_tpu.config import cfg
from mnc_tpu.models.mnc import MNC, MNCArch
from mnc_tpu.ops.masks import paste_masks
from mnc_tpu.ops.mask_voting import box_voting_per_det, mask_voting_per_det
from mnc_tpu.ops.nms import nms_indices
from mnc_tpu.utils.blob import prep_im_for_blob


@dataclasses.dataclass(frozen=True)
class PostCfg:
    """Static post-processing configuration (reference TEST.* semantics)."""

    nms_thresh: float = 0.3  # TEST.NMS per-class box NMS
    dets_per_class: int = 16  # padded per-class keep
    max_per_image: int = 100  # TEST.MAX_PER_IMAGE cross-class cap
    use_mask_merge: bool = True  # TEST.USE_MASK_MERGE
    mask_merge_iou: float = 0.5  # TEST.MASK_MERGE_IOU_THRESH
    # voting candidate pool per class: top-K by score.  The reference voted
    # over all of a class's detections, but sub-threshold candidates carry
    # negligible weight; 64 covers every practical case at ~5x less work.
    vote_top_k: int = 64
    # TEST.VOTE_BOXES: ALSO average the detection BOX over the same weighted
    # neighbor set (the ⚠box-averaging half of lib/nms/mv.pyx, SURVEY §2.1 —
    # VERDICT r3 item 4).  The merged mask is then voted into the AVERAGED
    # box's frame (and pasted there).  Default off = mask-only voting.
    vote_boxes: bool = False
    # 5-stage: also pool the FIRST-pass (stage-3) detections as NMS/voting
    # candidates, each with its own pass scores — doubles the candidate set
    # (and postprocess cost) for slightly denser voting neighborhoods.
    vote_both_passes: bool = False
    score_thresh: float = 0.0  # candidates below are dropped (CONF at demo time)
    paste: bool = True  # fuse full-canvas paste-back into the program
    binarize_thresh: float = 0.4  # cfg.BINARIZE_THRESH
    # TEST.VOTE_IMPL: voting mask-resample implementation — "einsum"
    # (per-pair hat matmuls) or "gather" (separable 2-tap take_along_axis,
    # same math to f32 rounding — ops/mask_voting.py::_resample_gather).
    vote_impl: str = "einsum"
    # TEST.PASTE_IMPL: "auto" = the XLA einsum — measured fastest on v5e
    # (0.86 ms vs 0.91–1.02 ms for every kernel variant at K=100/640×1024)
    # because XLA already fuses the binarize into the einsum epilogue (cost
    # analysis: 91 MB accessed, not the feared 260 MB round-trip).  "pallas"
    # forces the fused VMEM kernel (ops/pallas/paste_kernel.py) — a
    # validated non-default for future chips/canvases.
    paste_impl: str = "auto"
    # TEST.PASTE_DTYPE: binarized-paste einsum compute dtype — "bf16"
    # (default, half the HBM traffic) or "f32" (reference-exact parity).
    paste_dtype: str = "bf16"

    def resolved_paste_impl(self) -> str:
        return "einsum" if self.paste_impl == "auto" else self.paste_impl

    def resolved_paste_dtype(self):
        return jnp.float32 if self.paste_dtype == "f32" else jnp.bfloat16

    @classmethod
    def from_cfg(cls, **over) -> "PostCfg":
        # the reference tester NMS'd with MASK_MERGE_NMS_THRESH when voting was
        # on and TEST.NMS otherwise (both 0.3 by default)
        kw = dict(
            nms_thresh=(cfg.TEST.MASK_MERGE_NMS_THRESH
                        if cfg.TEST.USE_MASK_MERGE else cfg.TEST.NMS),
            max_per_image=cfg.TEST.MAX_PER_IMAGE,
            use_mask_merge=bool(cfg.TEST.USE_MASK_MERGE),
            mask_merge_iou=cfg.TEST.MASK_MERGE_IOU_THRESH,
            vote_boxes=bool(cfg.TEST.VOTE_BOXES),
            vote_both_passes=bool(cfg.TEST.VOTE_BOTH_PASSES),
            vote_impl=str(cfg.TEST.VOTE_IMPL),
            binarize_thresh=cfg.BINARIZE_THRESH,
            paste_impl=str(cfg.TEST.PASTE_IMPL),
            paste_dtype=str(cfg.TEST.PASTE_DTYPE),
        )
        kw.update(over)
        return cls(**kw)


def postprocess_detections(
    rois: jnp.ndarray,
    roi_valid: jnp.ndarray,
    cls_prob: jnp.ndarray,
    mask_logits: jnp.ndarray,
    post: PostCfg,
    canvas_hw: tuple[int, int] | None,
) -> dict:
    """Fixed-shape detection post-processing, fully on-device.

    Per foreground class: NMS over (rois, class score) → top dets_per_class;
    mask voting merges candidate soft masks into each survivor; then a
    cross-class top max_per_image cut.  Returns padded arrays + validity.
    """
    n, c = cls_prob.shape
    soft_masks = jax.nn.sigmoid(mask_logits)
    # static clamps: small candidate pools (CFM segdbs, tiny test configs)
    # must not exceed top_k capacities
    d = min(post.dets_per_class, n)

    def per_class(scores_c):
        ok = roi_valid & (scores_c > post.score_thresh)
        idx, keep = nms_indices(rois, scores_c, ok, post.nms_thresh, d)
        kept_scores = jnp.where(keep, scores_c[idx], 0.0)
        return idx, kept_scores, keep

    # vmap over foreground classes (class 0 = background skipped)
    fg_scores = cls_prob[:, 1:].T  # (C-1, N)
    idx_c, scores_c, keep_c = jax.vmap(per_class)(fg_scores)
    flat_idx = idx_c.reshape((c - 1) * d)
    flat_scores = scores_c.reshape((c - 1) * d)
    flat_valid = keep_c.reshape((c - 1) * d)
    flat_cls = jnp.repeat(jnp.arange(1, c, dtype=jnp.int32), d)

    k = min(post.max_per_image, (c - 1) * d)
    top_scores, top_idx = jax.lax.top_k(jnp.where(flat_valid, flat_scores, -1.0), k)
    roi_idx = flat_idx[top_idx]  # original roi of each surviving detection
    det_boxes = rois[roi_idx]
    det_classes = flat_cls[top_idx]

    if post.use_mask_merge:
        # Vote only the K cross-class survivors, each against the top
        # vote_top_k candidates of ITS class (score-weighted IoU neighbors).
        kv = min(post.vote_top_k, n)
        det_cand_scores = jnp.where(
            roi_valid[None, :], cls_prob.T[det_classes], 0.0)  # (K, N)
        cs, ci = jax.lax.top_k(det_cand_scores, kv)  # (K, kv)
        if post.vote_boxes:
            # neighbor set defined by the ORIGINAL kept box; masks are then
            # voted (and pasted) in the averaged box's frame
            det_boxes = box_voting_per_det(
                det_boxes, rois[ci], cs, post.mask_merge_iou)
        det_masks = mask_voting_per_det(
            det_boxes, rois[ci], cs, soft_masks[ci], post.mask_merge_iou,
            impl=post.vote_impl)
    else:
        det_masks = soft_masks[roi_idx]

    out = {
        "boxes": det_boxes,
        "scores": top_scores,
        "classes": det_classes,
        "masks": det_masks,
        "valid": top_scores > 0.0,
    }
    if post.paste and canvas_hw is not None:
        out["canvas_masks"] = paste_masks(
            out["masks"], out["boxes"], canvas_hw,
            binarize_thresh=post.binarize_thresh,
            impl=post.resolved_paste_impl(),
            compute_dtype=post.resolved_paste_dtype(),
        )
    return out


def vote_candidates(net_out: dict, post: PostCfg, n_stages: int, axis: int = 0):
    """(rois, valid, prob, masks) for postprocess — optionally pooling the
    5-stage first-pass detections too (PostCfg.vote_both_passes)."""
    keys = ("rois", "roi_valid", "cls_prob", "mask_logits")
    r, v, c, m = (net_out[k] for k in keys)
    if post.vote_both_passes and n_stages == 5:
        r = jnp.concatenate([r, net_out["stage3_rois"]], axis)
        v = jnp.concatenate([v, net_out["roi_valid"]], axis)
        c = jnp.concatenate([c, net_out["stage3_cls_prob"]], axis)
        m = jnp.concatenate([m, net_out["stage3_mask_logits"]], axis)
    return r, v, c, m


class MNCPipeline:
    """demo.py / test_net.py-compatible inference front-end.

    Usage:
        pipe = MNCPipeline(model, params)
        dets = pipe.detect(bgr_image)   # original-resolution outputs

    ``detect_canvas`` is the jitted canvas-space core (network + postprocess in
    one XLA program); ``detect`` adds the host-side pre/post coordinate
    bookkeeping back to original image resolution.
    """

    def __init__(self, model: MNC, params: Any, post: PostCfg | None = None):
        self.model = model
        # stage params on device ONCE: numpy leaves (load_npz/caffemodel
        # imports) would otherwise re-upload the full tree on every call —
        # catastrophic over a slow device link
        self.params = jax.device_put(params)
        self.arch: MNCArch = model.arch
        self.post = post or PostCfg.from_cfg()
        self._run = self._make_run(model)
        # portrait/landscape variants share params (convs + fixed-size warp
        # grids are canvas-independent); built lazily per orientation
        self._variants = {model.arch.canvas: (model, self._run)}
        self._run_batch = self._make_run_batch(model)
        self._batch_variants = {model.arch.canvas: self._run_batch}

    def _make_run_batch(self, model, post: PostCfg | None = None,
                        packed: bool = False):
        """Batched cascade + per-image postprocess as TWO device dispatches.

        Split at the cascade→postprocess boundary (one extra dispatch; the
        small (B, N, ·) cascade outputs round-trip through HBM) so a device
        fault can be attributed to one half.  (The round-3 TPU worker crash
        at non-primary canvas variants was bisected to the vmapped
        propose_rois gather composition and fixed structurally — apply_batch
        runs the propose stage through lax.map; see MNC.apply_batch.)
        """
        post = post or self.post

        net = jax.jit(lambda p, im, ii: model.apply(
            p, im, ii, method=MNC.apply_batch))

        @jax.jit
        def _post(net_out):
            # per-image postprocess (fc outputs → NMS → voting → paste)
            r, v, c, m = self._candidates(model, net_out, axis=1)
            out = jax.vmap(
                lambda r_, v_, c_, m_: postprocess_detections(
                    r_, v_, c_, m_, post, model.arch.canvas)
            )(r, v, c, m)
            if packed and "canvas_masks" in out:
                out = dict(out, canvas_masks=jnp.packbits(
                    out["canvas_masks"].astype(jnp.uint8), axis=-1))
            return out

        def _run_batch_impl(params, images, im_infos):
            return _post(net(params, images, im_infos))

        return _run_batch_impl

    def _candidates(self, model, net_out, axis=0):
        return vote_candidates(net_out, self.post, model.arch.n_stages, axis)

    def _make_run(self, model, post: PostCfg | None = None):
        post = post or self.post

        @jax.jit
        def _run(params, image, im_info):
            net_out = model.apply(params, image, im_info)
            r, v, c, m = self._candidates(model, net_out)
            return postprocess_detections(r, v, c, m, post,
                                          model.arch.canvas)

        return _run

    def _nopaste_variant(self, canvas_hw: tuple[int, int]):
        """run_fn with on-device paste-back disabled: returns only the
        (K, M, M) soft masks + boxes — ~35× less device→host transfer than
        the packed canvas stack.  The host unmolds masks per valid
        detection (the reference's own unmold path); everything up to the
        mask output is bit-identical to the pasting variant."""
        if not hasattr(self, "_nopaste_variants"):
            self._nopaste_variants = {}
        if canvas_hw not in self._nopaste_variants:
            model2, _ = self._variant(canvas_hw)
            post2 = dataclasses.replace(self.post, paste=False)
            self._nopaste_variants[canvas_hw] = self._make_run(model2, post2)
        return self._nopaste_variants[canvas_hw]

    def _pick_canvas(self, h0: int, w0: int, auto_orient: bool) -> tuple[int, int]:
        """Smallest canvas that admits the full reference scale for this
        image: the primary canvas, its transpose (auto_orient), and any
        TEST.CANVAS_BUCKETS entries (orientation-matched).  Smaller canvases
        cut trunk compute ~proportionally to area; each compiles one extra
        program variant."""
        canvas = self.arch.canvas
        if auto_orient and (h0 > w0) != (canvas[0] > canvas[1]):
            canvas = (canvas[1], canvas[0])
        buckets = [tuple(b) for b in (cfg.TEST.CANVAS_BUCKETS or ())]
        if not buckets:
            return canvas
        stride = self.arch.feat_stride
        cands = [canvas]
        for bh, bw in buckets:
            assert bh % stride == 0 and bw % stride == 0, \
                f"CANVAS_BUCKETS entries must be multiples of {stride}"
            if auto_orient and (h0 > w0) != (bh > bw):
                bh, bw = bw, bh
            cands.append((bh, bw))
        # raw reference scale (shorter side → SCALES[0], cap MAX_SIZE)
        short, long = min(h0, w0), max(h0, w0)
        scale = float(cfg.TEST.SCALES[0]) / short
        if round(scale * long) > cfg.TEST.MAX_SIZE:
            scale = float(cfg.TEST.MAX_SIZE) / long
        hs, ws = h0 * scale, w0 * scale
        fitting = [b for b in cands if b[0] >= hs and b[1] >= ws]
        if not fitting:
            return canvas
        return min(fitting, key=lambda b: b[0] * b[1])

    def _variant(self, canvas_hw: tuple[int, int]):
        """(model, run_fn) for a given canvas orientation (compiled lazily)."""
        if canvas_hw not in self._variants:
            arch2 = dataclasses.replace(self.arch, canvas=canvas_hw)
            model2 = MNC(arch=arch2)
            self._variants[canvas_hw] = (model2, self._make_run(model2))
        return self._variants[canvas_hw]

    def _packed_variant(self, canvas_hw: tuple[int, int]):
        """run_fn with bit-packed canvas masks for a given canvas (lazy)."""
        if not hasattr(self, "_packed_variants"):
            self._packed_variants = {}
        if canvas_hw not in self._packed_variants:
            _, run = self._variant(canvas_hw)

            @jax.jit
            def _run_packed(params, image, info):
                out = run(params, image, info)
                if "canvas_masks" in out:
                    out = dict(out, canvas_masks=jnp.packbits(
                        out["canvas_masks"].astype(jnp.uint8), axis=-1))
                return out

            self._packed_variants[canvas_hw] = _run_packed
        return self._packed_variants[canvas_hw]

    def _batch_variant(self, canvas_hw: tuple[int, int]):
        """Batched run_fn for a canvas variant (compiled lazily per
        (canvas, batch-size) combination — batch is a static dim)."""
        if canvas_hw not in self._batch_variants:
            model2, _ = self._variant(canvas_hw)
            self._batch_variants[canvas_hw] = self._make_run_batch(model2)
        return self._batch_variants[canvas_hw]

    def _nopaste_batch_variant(self, canvas_hw: tuple[int, int]):
        """Batched run_fn without on-device paste (see _nopaste_variant)."""
        if not hasattr(self, "_nopaste_batch_variants"):
            self._nopaste_batch_variants = {}
        if canvas_hw not in self._nopaste_batch_variants:
            model2, _ = self._variant(canvas_hw)
            post2 = dataclasses.replace(self.post, paste=False)
            self._nopaste_batch_variants[canvas_hw] = self._make_run_batch(
                model2, post2)
        return self._nopaste_batch_variants[canvas_hw]

    def _batch_packed_variant(self, canvas_hw: tuple[int, int]):
        if not hasattr(self, "_batch_packed_variants"):
            self._batch_packed_variants = {}
        if canvas_hw not in self._batch_packed_variants:
            model2, _ = self._variant(canvas_hw)
            self._batch_packed_variants[canvas_hw] = self._make_run_batch(
                model2, packed=True)
        return self._batch_packed_variants[canvas_hw]

    def detect_canvas(self, canvas: jnp.ndarray, im_info: jnp.ndarray) -> dict:
        return self._run(self.params, canvas, im_info)

    def detect_canvas_packed(self, canvas: jnp.ndarray,
                             im_info: jnp.ndarray) -> dict:
        """detect_canvas with the (N, H, W) canvas-mask stack bit-packed on
        device (8x less transfer — the tunneled-TPU eval bottleneck).  Use
        :func:`unpack_canvas_masks` on the host-fetched dict.  Shares the
        primary-canvas program with :meth:`detect` (one compile, not two)."""
        run = self._packed_variant(tuple(self.arch.canvas))
        return run(self.params, canvas, im_info)

    def detect_canvas_batch(self, canvases: jnp.ndarray, im_infos: jnp.ndarray) -> dict:
        """Batched throughput path: (B, H, W, 3) + (B, 3) → batched dets."""
        return self._run_batch(self.params, canvases, im_infos)

    def detect_canvas_batch_packed(self, canvases: jnp.ndarray,
                                   im_infos: jnp.ndarray) -> dict:
        """Batched detect with bit-packed canvas masks (see
        detect_canvas_packed).  Shares the primary-canvas batched program
        with :meth:`detect_many` (one compile, not two)."""
        run = self._batch_packed_variant(tuple(self.model.arch.canvas))
        return run(self.params, canvases, im_infos)

    def detect(self, bgr_image: np.ndarray, auto_orient: bool | None = None,
               packed: bool | None = None,
               host_paste: bool | None = None) -> dict:
        """Full host API: BGR uint8 image → original-resolution detections.

        Returns numpy dict: boxes (K, 4) in original coords, scores (K,),
        classes (K,), valid (K,), masks (K, M, M) soft, and full_masks
        (K, H_orig, W_orig) binary if pasting is enabled.

        ``auto_orient`` (default cfg.TEST.AUTO_PORTRAIT): portrait images run
        on the transposed (portrait) canvas so they get the exact reference
        scale rule instead of extra downscale into the landscape canvas.

        ``packed`` (default cfg.TEST.PACKED_TRANSFER): bit-pack the canvas
        mask stack on device and unpack on the host — identical outputs, 8×
        less device→host transfer (the dominant cost over slow links).

        ``host_paste`` (default cfg.TEST.HOST_PASTE): skip the on-device
        canvas paste and transfer only the (K, M, M) soft masks (~35× less
        than even the packed canvas stack); full_masks are unmolded on the
        host per VALID detection — the reference's own unmold path
        (cv2.resize into the box + threshold).  Boxes/scores/soft masks are
        bit-identical to the pasting variant; full_masks differ only by
        resampling route (one bilinear resize at original resolution vs
        paste-at-canvas + resize).
        """
        if auto_orient is None:
            auto_orient = bool(cfg.TEST.AUTO_PORTRAIT)
        if host_paste is None:
            host_paste = bool(cfg.TEST.HOST_PASTE)
        if packed is None:
            packed = bool(cfg.TEST.PACKED_TRANSFER) and self.post.paste
        # host_paste wins over even an explicit packed=True: the nopaste
        # program emits no canvas masks, so there is nothing to bit-pack
        packed = packed and not host_paste
        h0, w0 = bgr_image.shape[:2]
        canvas_hw = self._pick_canvas(h0, w0, auto_orient)
        if host_paste:
            run = self._nopaste_variant(canvas_hw)
        else:
            run = (self._packed_variant(canvas_hw) if packed
                   else self._variant(canvas_hw)[1])
        canvas, im_info = prep_im_for_blob(bgr_image, canvas_hw=canvas_hw,
                                           u8=bool(cfg.TEST.U8_TRANSFER))
        dets = jax.device_get(run(self.params, jnp.asarray(canvas), jnp.asarray(im_info)))
        if packed:
            dets = unpack_canvas_masks(dets, canvas_hw[1])
        out = self._finalize_host(dets, bgr_image.shape[:2], im_info)
        if host_paste:
            out["full_masks"] = unmold_masks_host(
                out["masks"], out["boxes"], out["valid"], (h0, w0),
                self.post.binarize_thresh)
        return out

    @staticmethod
    def _finalize_host(dets: dict, orig_hw: tuple[int, int], im_info) -> dict:
        """Canvas-space device output → original-resolution host dict."""
        scale = float(im_info[2])
        out = {
            "boxes": dets["boxes"] / scale,
            "scores": dets["scores"],
            "classes": dets["classes"],
            "masks": dets["masks"],
            "valid": dets["valid"],
        }
        if "canvas_masks" in dets:
            h, w = orig_hw
            sh, sw = int(im_info[0]), int(im_info[1])
            full = []
            for m in dets["canvas_masks"]:
                full.append(_resize_mask_to(m[:sh, :sw], (h, w)))
            out["full_masks"] = np.stack(full).astype(np.uint8)
        return out

    def detect_many(self, bgr_images, batch_size: int = 8,
                    auto_orient: bool | None = None,
                    packed: bool | None = None,
                    host_paste: bool | None = None,
                    max_in_flight: int = 4) -> list[dict]:
        """Batched mixed-size host API: list of BGR images → list of
        original-resolution detection dicts (same per-image contract as
        :meth:`detect`).

        Images are grouped by their picked canvas variant and run through the
        batched cascade (``MNC.apply_batch`` — fc heads amortized over the
        B·N flattened RoI set), tail chunks padded by repetition.  One
        program compiles per (canvas variant, ``batch_size``); keep
        ``batch_size`` fixed across calls.  This is the throughput path for
        streams and micro-batched serving — single-image :meth:`detect`
        re-streams the ~0.5 GB of fc weights from HBM per image, which
        dominates at batch 1.  ``max_in_flight`` bounds how many dispatched
        chunks' output buffers may be device-resident at once (transfer/
        compute overlap at O(1) memory — arbitrarily long streams don't
        accumulate HBM).
        """
        if auto_orient is None:
            auto_orient = bool(cfg.TEST.AUTO_PORTRAIT)
        if host_paste is None:
            host_paste = bool(cfg.TEST.HOST_PASTE)
        if packed is None:
            packed = bool(cfg.TEST.PACKED_TRANSFER) and self.post.paste
        packed = packed and not host_paste  # see detect(): host_paste wins
        preps, groups = [], {}
        u8 = bool(cfg.TEST.U8_TRANSFER)
        for i, im in enumerate(bgr_images):
            h0, w0 = im.shape[:2]
            chw = self._pick_canvas(h0, w0, auto_orient)
            canvas, info = prep_im_for_blob(im, canvas_hw=chw, u8=u8)
            preps.append((chw, canvas, info, (h0, w0)))
            groups.setdefault(chw, []).append(i)
        results: list = [None] * len(preps)

        def _fetch(chunk, chw, dev_out):
            dets = jax.device_get(dev_out)
            for k, j in enumerate(chunk):
                d = {key: v[k] for key, v in dets.items()}
                if packed:
                    d = unpack_canvas_masks(d, chw[1])
                out = self._finalize_host(d, preps[j][3], preps[j][2])
                if host_paste:
                    out["full_masks"] = unmold_masks_host(
                        out["masks"], out["boxes"], out["valid"],
                        preps[j][3], self.post.binarize_thresh)
                results[j] = out

        # Dispatch chunks without blocking — XLA queues the uploads +
        # programs asynchronously, so chunk k+1's host→device copy overlaps
        # chunk k's compute instead of serializing on a per-chunk device_get
        # round-trip — but keep at most ``max_in_flight`` chunks' output
        # buffers resident: fetching the oldest once the window fills bounds
        # device memory at O(max_in_flight), not O(n_images) (canvas-mask
        # stacks are ~8-65 MB per image depending on packing).
        pending: list = []
        for chw, idxs in groups.items():
            if host_paste:
                run = self._nopaste_batch_variant(chw)
            else:
                run = (self._batch_packed_variant(chw) if packed
                       else self._batch_variant(chw))
            for start in range(0, len(idxs), batch_size):
                chunk = idxs[start:start + batch_size]
                sel = chunk + [chunk[-1]] * (batch_size - len(chunk))
                images = jnp.asarray(np.stack([preps[j][1] for j in sel]))
                infos = jnp.asarray(np.stack([preps[j][2] for j in sel]))
                pending.append((chunk, chw, run(self.params, images, infos)))
                if len(pending) >= max(1, max_in_flight):
                    _fetch(*pending.pop(0))
        for item in pending:
            _fetch(*item)
        return results

    def prewarm(self, batch_size: int | None = None,
                auto_orient: bool | None = None,
                packed: bool | None = None,
                host_paste: bool | None = None) -> list[tuple[int, int]]:
        """Compile every canvas variant :meth:`detect` / :meth:`detect_many`
        can pick — the primary canvas, its transpose (TEST.AUTO_PORTRAIT),
        and each TEST.CANVAS_BUCKETS entry ± transpose — by running one dummy
        image through the exact program variant the host API would dispatch.

        Tiled NMS at the reference 6000 working set compiles in minutes per
        variant; with the persistent compilation cache this moves those
        compiles out of the serving path, both for this process (first
        request) and across restarts (cache hits).  ``batch_size``
        additionally warms the batched (:meth:`detect_many`) program per
        variant.  Returns the canvas shapes warmed, in dispatch-preference
        order.
        """
        if auto_orient is None:
            auto_orient = bool(cfg.TEST.AUTO_PORTRAIT)
        if host_paste is None:
            host_paste = bool(cfg.TEST.HOST_PASTE)
        if packed is None:
            packed = bool(cfg.TEST.PACKED_TRANSFER) and self.post.paste
        packed = packed and not host_paste  # see detect()
        cands = [tuple(self.arch.canvas)]
        cands += [tuple(b) for b in (cfg.TEST.CANVAS_BUCKETS or ())]
        if auto_orient:
            cands += [(w, h) for h, w in cands]
        canvases = list(dict.fromkeys(cands))
        u8 = bool(cfg.TEST.U8_TRANSFER)
        for chw in canvases:
            dummy = np.zeros((*chw, 3), np.uint8)
            canvas, info = prep_im_for_blob(dummy, canvas_hw=chw, u8=u8)
            if host_paste:
                run = self._nopaste_variant(chw)
            else:
                run = (self._packed_variant(chw) if packed
                       else self._variant(chw)[1])
            out = run(self.params, jnp.asarray(canvas), jnp.asarray(info))
            jax.device_get(out["valid"])  # force execution; tiny fetch
            if batch_size:
                if host_paste:
                    runb = self._nopaste_batch_variant(chw)
                else:
                    runb = (self._batch_packed_variant(chw) if packed
                            else self._batch_variant(chw))
                images = jnp.asarray(np.stack([canvas] * batch_size))
                infos = jnp.asarray(np.stack([info] * batch_size))
                jax.device_get(runb(self.params, images, infos)["valid"])
        return canvases


def unmold_masks_host(masks: np.ndarray, boxes: np.ndarray,
                      valid: np.ndarray, hw: tuple[int, int],
                      binarize_thresh: float = 0.4) -> np.ndarray:
    """Host-side mask unmold — ≙ the reference tester/demo unmold: per
    valid detection, bilinear-resize the (M, M) soft mask into its box and
    threshold into a full-resolution binary canvas.

    Args:
      masks: (K, M, M) soft masks in box frame.
      boxes: (K, 4) boxes at the TARGET resolution (e.g. original image).
      valid: (K,) bool; invalid rows produce all-zero masks (no resize paid).
      hw: target (H, W).

    Returns (K, H, W) uint8.
    """
    h, w = hw
    out = np.zeros((len(masks), h, w), np.uint8)
    for k in range(len(masks)):
        if not valid[k]:
            continue
        x1, y1, x2, y2 = boxes[k]
        xi1, yi1 = max(int(np.round(x1)), 0), max(int(np.round(y1)), 0)
        xi2 = min(int(np.round(x2)) + 1, w)
        yi2 = min(int(np.round(y2)) + 1, h)
        bw, bh = xi2 - xi1, yi2 - yi1
        if bw <= 0 or bh <= 0:
            continue
        m = _resize_soft(np.asarray(masks[k], np.float32), (bh, bw))
        out[k, yi1:yi2, xi1:xi2] = (m > binarize_thresh).astype(np.uint8)
    return out


def _resize_soft(m: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    try:
        import cv2

        return cv2.resize(m, (hw[1], hw[0]), interpolation=cv2.INTER_LINEAR)
    except ImportError:  # pragma: no cover
        ys = np.clip((np.arange(hw[0]) + 0.5) * m.shape[0] / hw[0] - 0.5,
                     0, m.shape[0] - 1)
        xs = np.clip((np.arange(hw[1]) + 0.5) * m.shape[1] / hw[1] - 0.5,
                     0, m.shape[1] - 1)
        yi, xi = ys.astype(int), xs.astype(int)
        return m[np.ix_(yi, xi)]


def unpack_canvas_masks(dets: dict, canvas_w: int) -> dict:
    """Host-side inverse of detect_canvas_packed's bit packing."""
    if "canvas_masks" in dets and dets["canvas_masks"].shape[-1] != canvas_w:
        dets = dict(dets, canvas_masks=np.unpackbits(
            dets["canvas_masks"], axis=-1, count=canvas_w).astype(bool))
    return dets


def _resize_mask_to(mask: np.ndarray, hw: tuple[int, int]) -> np.ndarray:
    try:
        import cv2

        return (cv2.resize(mask.astype(np.float32), (hw[1], hw[0]),
                           interpolation=cv2.INTER_LINEAR) > 0.5).astype(np.uint8)
    except ImportError:  # pragma: no cover
        ys = np.clip((np.arange(hw[0]) * mask.shape[0] / hw[0]).astype(int), 0,
                     mask.shape[0] - 1)
        xs = np.clip((np.arange(hw[1]) * mask.shape[1] / hw[1]).astype(int), 0,
                     mask.shape[1] - 1)
        return (mask[np.ix_(ys, xs)] > 0.5).astype(np.uint8)
