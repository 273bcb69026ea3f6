"""Training data pipeline — ≙ reference ``lib/pylayer/mnc_data_layer.py`` +
``lib/db/roidb.py`` batching.

Turns imdb roidb/maskdb records into the fixed-shape device batches the
jitted train step consumes: image scaled by the reference rule and padded
into the static canvas, gt boxes scaled alike and padded to MAX_GT, masks at
the fixed gt resolution.  Horizontal-flip augmentation (TRAIN.USE_FLIPPED)
doubles the epoch.  A background prefetch thread keeps the accelerator fed
(the reference loaded synchronously on the solver thread — SURVEY.md §3.2).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from mnc_tpu.config import cfg
from mnc_tpu.data.imdb import IMDB
from mnc_tpu.utils.blob import prep_im_for_blob


def load_image(imdb: IMDB, i: int) -> np.ndarray:
    path = imdb.image_path_at(i)
    if path.startswith("synthetic://"):
        return imdb.example(i)["image"]
    import cv2

    im = cv2.imread(path)
    assert im is not None, f"failed to read {path}"
    return im


def make_example(
    imdb: IMDB,
    roidb_entry: dict,
    mask_entry: dict,
    i: int,
    max_gt: int,
    canvas_hw,
    gt_mask_size: int,
    train_scales=None,
    max_size=None,
    synthetic: bool = False,
    u8: bool | None = None,
) -> dict:
    """One fixed-shape training example from db records.

    ``u8`` (default cfg.TRAIN.U8_TRANSFER; real-image path only): keep the
    canvas uint8 — the train step mean-subtracts on device
    (``utils.blob.device_normalize``), 4× less host→device traffic per step.
    Synthetic imdbs emit pre-normalized float scenes and are unaffected."""
    im = load_image(imdb, i)
    if roidb_entry.get("flipped"):
        im = im[:, ::-1]

    if synthetic:
        canvas = im.astype(np.float32)
        if canvas.shape[:2] != tuple(canvas_hw):
            padded = np.zeros((*canvas_hw, 3), np.float32)
            padded[: canvas.shape[0], : canvas.shape[1]] = canvas
            canvas = padded
        im_info = np.array([im.shape[0], im.shape[1], 1.0], np.float32)
        scale = 1.0
    else:
        if u8 is None:
            u8 = bool(cfg.TRAIN.U8_TRANSFER)
        canvas, im_info = prep_im_for_blob(
            im,
            target_size=(train_scales or cfg.TRAIN.SCALES)[0],
            max_size=max_size or cfg.TRAIN.MAX_SIZE,
            canvas_hw=canvas_hw,
            u8=u8,
        )
        scale = float(im_info[2])

    g = min(len(roidb_entry["boxes"]), max_gt)
    gt_boxes = np.zeros((max_gt, 4), np.float32)
    gt_classes = np.zeros((max_gt,), np.int32)
    gt_valid = np.zeros((max_gt,), bool)
    gt_masks = np.zeros((max_gt, gt_mask_size, gt_mask_size), np.float32)
    gt_boxes[:g] = roidb_entry["boxes"][:g] * scale
    gt_classes[:g] = roidb_entry["classes"][:g]
    gt_valid[:g] = True
    if g > 0:
        src_masks = mask_entry["masks"][:g]
        if src_masks.shape[-1] != gt_mask_size:
            from mnc_tpu.utils.blob import resize_mask_area

            s = gt_mask_size
            # area filter when cv2 is present (tools/mask_fidelity_study.py)
            src_masks = np.stack([resize_mask_area(m, (s, s)) for m in src_masks])
        gt_masks[:g] = src_masks

    return {
        "image": canvas,
        "im_info": im_info,
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_valid": gt_valid,
        "gt_masks": gt_masks,
    }


class TrainLoader:
    """Shuffled, flip-augmented, prefetching loader over an imdb.

    Iterates forever, yielding image-batched dicts of shape
    (ims_per_batch, …) ready for the jitted train step.
    """

    def __init__(self, imdb: IMDB, max_gt=None, canvas_hw=None, gt_mask_size=28,
                 ims_per_batch=1, use_flipped=None, seed=3, prefetch=4,
                 synthetic=None, segdb_dir=None, seg_top_k=64,
                 seg_mask_size=None):
        self.imdb = imdb
        self.roidb = imdb.roidb()
        self.maskdb = imdb.maskdb()
        # CFM training: per-image precomputed segment proposals
        # (tools/prepare_mcg_maskdb.py pkl format, original-image coords)
        self.segdb_dir = segdb_dir
        self.seg_top_k = seg_top_k
        self.seg_mask_size = seg_mask_size or int(cfg.MASK_SIZE)
        self._seg_cache: dict = {}
        self.max_gt = max_gt or cfg.STATIC.MAX_GT
        self.canvas_hw = canvas_hw or tuple(cfg.STATIC.CANVAS)
        self.gt_mask_size = gt_mask_size
        self.ims_per_batch = ims_per_batch
        self.use_flipped = (cfg.TRAIN.USE_FLIPPED if use_flipped is None
                            else use_flipped)
        self.synthetic = (imdb.name.startswith("synthetic")
                          if synthetic is None else synthetic)
        self.rs = np.random.RandomState(seed)
        self._perm = []
        self._q: queue.Queue = queue.Queue(maxsize=prefetch)
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._started = False

    def _next_index(self):
        if not self._perm:
            n = len(self.roidb)
            entries = [(i, False) for i in range(n)]
            if self.use_flipped:
                entries += [(i, True) for i in range(n)]
            self.rs.shuffle(entries)
            self._perm = entries
        return self._perm.pop()

    def _make(self, i: int, flipped: bool) -> dict:
        entry, masks = self.roidb[i], self.maskdb[i]
        if flipped:
            width = self.canvas_hw[1] if self.synthetic else entry.get("width")
            if width is None:
                import cv2

                width = cv2.imread(self.imdb.image_path_at(i)).shape[1]
                entry["width"] = width  # cache for subsequent epochs
            entry, masks = IMDB.flip_entry(dict(entry, flipped=False), masks, width)
            entry["flipped"] = True
        ex = make_example(self.imdb, entry, masks, i, self.max_gt,
                          self.canvas_hw, self.gt_mask_size,
                          synthetic=self.synthetic)
        if self.segdb_dir is not None:
            ex.update(self._segments(i, flipped, entry,
                                     scale=float(ex["im_info"][2])))
        return ex

    def _segments(self, i: int, flipped: bool, entry: dict, scale: float) -> dict:
        """Fixed-shape segment-proposal arrays for CFM training.

        pkl boxes are original-image coords → scaled to the canvas; flipped
        copies mirror boxes about the original width (+1 convention, as
        ``IMDB.flip_entry``) and reverse mask x.
        """
        import os.path as osp
        import pickle

        k, s = self.seg_top_k, self.seg_mask_size
        if i not in self._seg_cache:
            image_id = self.imdb.image_index[i]
            path = osp.join(self.segdb_dir, f"{image_id}.pkl")
            if not osp.exists(path):
                raise FileNotFoundError(
                    f"segdb: no segment proposals for image {image_id!r} "
                    f"({path} missing) — run tools/prepare_mcg_maskdb.py "
                    f"over the full image list first")
            with open(path, "rb") as f:
                rec = pickle.load(f)
            # Cache the PROCESSED fixed-shape arrays (top-k slice, resized
            # masks), not the raw record: a real MCG segdb carries thousands
            # of full-size proposal masks per image, which would grow the
            # cache to many GB over an epoch and redo the resize every visit.
            nseg = min(len(rec["boxes"]), k)
            cboxes = np.zeros((k, 4), np.float32)
            cmasks = np.zeros((k, s, s), np.float32)
            cvalid = np.zeros((k,), bool)
            cboxes[:nseg] = np.asarray(rec["boxes"][:nseg], np.float32)
            src = np.asarray(rec["masks"][:nseg], np.float32)
            if nseg and src.shape[-1] != s:
                import cv2

                src = np.stack(
                    [cv2.resize(m, (s, s), interpolation=cv2.INTER_AREA)
                     for m in src])
            cmasks[:nseg] = src
            cvalid[:nseg] = True
            self._seg_cache[i] = (cboxes, cmasks, cvalid, nseg)
        cboxes, cmasks, cvalid, nseg = self._seg_cache[i]
        boxes, masks, valid = cboxes.copy(), cmasks.copy(), cvalid.copy()
        if flipped:
            # _make always caches entry["width"] before flipping; the canvas
            # width is NOT the original image width, so never fall back to it.
            width = entry["width"]
            x1 = boxes[:nseg, 0].copy()
            boxes[:nseg, 0] = width - boxes[:nseg, 2] - 1
            boxes[:nseg, 2] = width - x1 - 1
            masks[:nseg] = masks[:nseg, :, ::-1]
        boxes[:nseg] *= scale
        return {"seg_boxes": boxes, "seg_masks": masks, "seg_valid": valid}

    def _batch(self) -> dict:
        exs = [self._make(*self._next_index()) for _ in range(self.ims_per_batch)]
        if self.ims_per_batch == 1:
            return exs[0]
        return {k: np.stack([e[k] for e in exs]) for k in exs[0]}

    def _worker(self):
        while True:
            self._q.put(self._batch())

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        if not self._started:
            self._thread.start()
            self._started = True
        return self._q.get()
