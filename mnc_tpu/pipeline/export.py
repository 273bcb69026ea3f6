"""Serialized deployment artifacts via ``jax.export`` (StableHLO).

The reference's deployment artifact was the ``.caffemodel`` + ``test.prototxt``
pair — trained weights plus a declarative graph, loadable by any Caffe build
without the training harness (SURVEY.md §2.2 proto-schema row; §3.1
``caffe.Net(prototxt, caffemodel, TEST)``).  The TPU-native equivalent is a
serialized ``jax.export`` artifact: the ENTIRE canvas-space inference program
(trunk → RPN → on-device NMS → cascade → postprocess) lowered to StableHLO
with the trained weights baked in as constants.  A consumer reloads and calls
it from any JAX process (same-or-newer jaxlib) WITHOUT ``mnc_tpu``'s model
code on the import path — and the artifact is lowered for BOTH cpu and tpu by
default, so one file serves laptop smoke tests and fleet deployment.

    blob = export_inference(model, params)          # bytes
    fn = deserialize_inference(blob)                # callable
    dets = fn(canvas, im_info)                      # same dict as detect_canvas

Host-side pre/post (image resize to canvas, mask unmold) stays outside the
artifact, exactly as it stays outside the jitted program in `MNCPipeline`.
"""

from __future__ import annotations

import json
import struct
from typing import Any

import jax
import jax.numpy as jnp
from jax import export as jax_export

from mnc_tpu.models.mnc import MNC
from mnc_tpu.pipeline.inference import (
    PostCfg,
    postprocess_detections,
    vote_candidates,
)

# both platforms by default: the artifact is the deployment unit, and the
# cascade is pure XLA (no Pallas on the default path), so multi-platform
# lowering costs only artifact bytes
DEFAULT_PLATFORMS = ("cpu", "tpu")

# Artifact container: magic + u32 meta length + JSON meta + StableHLO blob.
# The meta carries the HOST-side postprocess knobs the program was exported
# under (binarize threshold for unmold) so a consumer can't silently
# diverge from the live pipeline.  Raw (magic-less) blobs from older
# exports still load — meta falls back to defaults.
_MAGIC = b"MNCX\x01"


def _pack_meta(blob: bytes, meta: dict) -> bytes:
    m = json.dumps(meta, sort_keys=True).encode()
    return _MAGIC + struct.pack("<I", len(m)) + m + blob


def _unpack_meta(data: bytes) -> tuple[bytes, dict]:
    if data[: len(_MAGIC)] != _MAGIC:
        return data, {}
    (n,) = struct.unpack_from("<I", data, len(_MAGIC))
    off = len(_MAGIC) + 4
    return data[off + n:], json.loads(data[off:off + n])


def export_inference(
    model: MNC,
    params: Any,
    post: PostCfg | None = None,
    batch: int | None = None,
    platforms: tuple[str, ...] = DEFAULT_PLATFORMS,
) -> bytes:
    """Serialize the full inference program (weights baked in) to bytes.

    ``batch=None`` exports the single-image program
    ``(H, W, 3) f32, (3,) f32 → detections dict``; ``batch=B`` exports the
    batched-throughput program ``(B, H, W, 3), (B, 3) → batched dict``
    (``MNC.apply_batch`` — the detect_many serving path).
    """
    post = post or PostCfg.from_cfg()
    arch = model.arch
    params = jax.device_put(params)

    if batch:
        def fn(images, im_infos):
            out = model.apply(params, images, im_infos,
                              method=MNC.apply_batch)
            r, v, c, m = vote_candidates(out, post, arch.n_stages, axis=1)
            return jax.vmap(
                lambda r_, v_, c_, m_: postprocess_detections(
                    r_, v_, c_, m_, post, arch.canvas)
            )(r, v, c, m)

        args = (jax.ShapeDtypeStruct((batch, *arch.canvas, 3), jnp.float32),
                jax.ShapeDtypeStruct((batch, 3), jnp.float32))
    else:
        def fn(image, im_info):
            out = model.apply(params, image, im_info)
            r, v, c, m = vote_candidates(out, post, arch.n_stages)
            return postprocess_detections(r, v, c, m, post, arch.canvas)

        args = (jax.ShapeDtypeStruct((*arch.canvas, 3), jnp.float32),
                jax.ShapeDtypeStruct((3,), jnp.float32))

    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(*args)
    return _pack_meta(bytes(exported.serialize()),
                      {"binarize_thresh": post.binarize_thresh,
                       "paste": post.paste})


def deserialize_inference(blob: bytes):
    """bytes → callable with the exported signature (jit-compiled on call)."""
    raw, _ = _unpack_meta(bytes(blob))
    exported = jax_export.deserialize(raw)
    return jax.jit(exported.call)


def save_exported(path: str, blob: bytes) -> None:
    with open(path, "wb") as f:
        f.write(blob)


def load_exported(path: str):
    with open(path, "rb") as f:
        return deserialize_inference(f.read())


class ExportedPipeline:
    """``detect()`` front-end over a serialized artifact — NO model code.

    The consuming process needs only jax + the host pre/post helpers (image
    resize to the canvas, coordinate un-scaling, mask unmold); the network,
    NMS, voting, and paste-back are all inside the artifact.  This is the
    serving analogue of the reference's demo loading prototxt+caffemodel into
    a bare ``caffe.Net`` (SURVEY.md §3.1).

        pipe = ExportedPipeline("mnc.jaxexport")
        dets = pipe.detect(bgr_image)   # same dict contract as MNCPipeline
    """

    def __init__(self, path_or_blob, binarize_thresh: float | None = None):
        if isinstance(path_or_blob, (bytes, bytearray)):
            blob = bytes(path_or_blob)
        else:
            with open(path_or_blob, "rb") as f:
                blob = f.read()
        raw, self.meta = _unpack_meta(blob)
        self._exported = jax_export.deserialize(raw)
        shape = self._exported.in_avals[0].shape
        assert len(shape) == 3, (
            "ExportedPipeline drives the single-image artifact; got input "
            f"shape {shape} (batched artifacts are called directly)")
        self.canvas: tuple[int, int] = (int(shape[0]), int(shape[1]))
        # host unmold threshold: explicit arg > artifact meta > PostCfg
        # default — so the artifact reproduces the live pipeline's masks
        # even under a non-default cfg.BINARIZE_THRESH at export time
        if binarize_thresh is None:
            binarize_thresh = self.meta.get("binarize_thresh",
                                            PostCfg.binarize_thresh)
        self.binarize_thresh = float(binarize_thresh)
        self._fn = jax.jit(self._exported.call)

    def detect(self, bgr_image) -> dict:
        """BGR uint8 image → original-resolution detections (numpy dict)."""
        from mnc_tpu.pipeline.inference import MNCPipeline, unmold_masks_host
        from mnc_tpu.utils.blob import prep_im_for_blob

        canvas, im_info = prep_im_for_blob(bgr_image, canvas_hw=self.canvas)
        dets = jax.device_get(
            self._fn(jnp.asarray(canvas), jnp.asarray(im_info)))
        out = MNCPipeline._finalize_host(dets, bgr_image.shape[:2], im_info)
        if "full_masks" not in out:  # artifact exported with paste=False
            out["full_masks"] = unmold_masks_host(
                out["masks"], out["boxes"], out["valid"],
                bgr_image.shape[:2], self.binarize_thresh)
        return out
