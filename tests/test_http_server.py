"""HTTP serving front-end (mnc_tpu/pipeline/server.py)."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from mnc_tpu.pipeline.server import decode_image, make_http_server


@pytest.fixture()
def server():
    calls = []

    def detect_fn(img):
        calls.append(img.shape)
        return {"instances": [{"box": [1.0, 2.0, 3.0, 4.0],
                               "class_id": 1, "score": 0.9,
                               "shape": list(img.shape)}]}

    srv = make_http_server(detect_fn, host="127.0.0.1", port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv, calls
    srv.shutdown()


def _url(srv, path):
    return f"http://127.0.0.1:{srv.server_address[1]}{path}"


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_healthz(server):
    srv, _ = server
    with urllib.request.urlopen(_url(srv, "/healthz"), timeout=10) as r:
        assert json.load(r) == {"status": "ok"}


def test_detect_npy_roundtrip(server):
    srv, calls = server
    img = np.random.RandomState(0).randint(0, 255, (30, 40, 3), np.uint8)
    req = urllib.request.Request(_url(srv, "/detect"), data=_npy_bytes(img),
                                 method="POST")
    with urllib.request.urlopen(req, timeout=10) as r:
        out = json.load(r)
    assert out["instances"][0]["shape"] == [30, 40, 3]
    assert calls == [(30, 40, 3)]


def test_detect_bad_body_400(server):
    srv, _ = server
    req = urllib.request.Request(_url(srv, "/detect"), data=b"not an image",
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 400


def test_unknown_path_404(server):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(_url(srv, "/nope"), timeout=10)
    assert e.value.code == 404


def test_detect_fn_error_500(server):
    srv, calls = server
    # a 2-channel npy decodes to None → 400; to reach 500 we need a valid
    # image and a failing detect_fn — use a fresh server for that
    srv.shutdown()

    def boom(img):
        raise RuntimeError("kaboom")

    srv2 = make_http_server(boom, host="127.0.0.1", port=0)
    threading.Thread(target=srv2.serve_forever, daemon=True).start()
    img = np.zeros((4, 4, 3), np.uint8)
    req = urllib.request.Request(_url(srv2, "/detect"), data=_npy_bytes(img),
                                 method="POST")
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=10)
    assert e.value.code == 500
    srv2.shutdown()


def test_decode_image_npy_shape_guard():
    assert decode_image(_npy_bytes(np.zeros((5, 5), np.uint8))) is None
    got = decode_image(_npy_bytes(np.zeros((5, 5, 3), np.uint8)))
    assert got is not None and got.shape == (5, 5, 3)


def test_micro_batcher_coalesces():
    """Concurrent submits coalesce into one batch_fn call; results map back
    to their submitters in order."""
    import time as _time

    from mnc_tpu.pipeline.server import MicroBatcher

    def batch_fn(imgs):
        _time.sleep(0.05)  # hold the worker so submits pile up
        return [{"mean": float(np.mean(im))} for im in imgs]

    mb = MicroBatcher(batch_fn, max_batch=4, max_wait_ms=100)
    imgs = [np.full((2, 2, 3), v, np.uint8) for v in (10, 20, 30, 40, 50)]
    outs = [None] * len(imgs)

    def worker(i):
        outs[i] = mb.submit(imgs[i])

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(len(imgs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert [o["mean"] for o in outs] == [10.0, 20.0, 30.0, 40.0, 50.0]
    assert max(mb.batch_sizes) > 1, mb.batch_sizes  # coalescing happened
    assert max(mb.batch_sizes) <= 4
    mb.close()


def test_micro_batcher_error_propagates():
    from mnc_tpu.pipeline.server import MicroBatcher

    def boom(imgs):
        raise ValueError("nope")

    mb = MicroBatcher(boom, max_batch=2, max_wait_ms=1)
    with pytest.raises(ValueError):
        mb.submit(np.zeros((2, 2, 3), np.uint8))
    mb.close()


def test_micro_batcher_short_result_errors():
    """A batch_fn that returns fewer results than inputs must error every
    waiter, not silently strand the unmatched tail."""
    from mnc_tpu.pipeline.server import MicroBatcher

    def short(imgs):
        return [{"ok": 1}] * (len(imgs) - 1) if len(imgs) > 1 else [{"ok": 1}]

    mb = MicroBatcher(short, max_batch=3, max_wait_ms=100)
    errs, outs = [], []

    def worker():
        try:
            outs.append(mb.submit(np.zeros((2, 2, 3), np.uint8)))
        except RuntimeError as e:
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    # whichever way the queue coalesced, nobody strands: every submit
    # returned or raised
    assert len(errs) + len(outs) == 3
    if max(mb.batch_sizes) > 1:  # a short batch happened → all its waiters
        assert errs and "results for" in str(errs[0])
    mb.close()


def test_micro_batcher_close_unblocks_and_rejects():
    """close() errors still-queued items, and later submits raise instead
    of hanging forever."""
    from mnc_tpu.pipeline.server import MicroBatcher

    mb = MicroBatcher(lambda imgs: [{}] * len(imgs), max_batch=2,
                      max_wait_ms=1)
    mb.submit(np.zeros((2, 2, 3), np.uint8))  # sanity: works while open
    mb.close()
    with pytest.raises(RuntimeError):
        mb.submit(np.zeros((2, 2, 3), np.uint8))


def test_http_server_batched_mode():
    """End-to-end: server with batch_fn serves concurrent POSTs."""
    def batch_fn(imgs):
        return [{"instances": [], "hw": list(im.shape[:2])} for im in imgs]

    srv = make_http_server(batch_fn=batch_fn, host="127.0.0.1", port=0,
                           max_batch=4, max_wait_ms=50)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    results = [None] * 6

    def post(i):
        img = np.zeros((10 + i, 20, 3), np.uint8)
        req = urllib.request.Request(_url(srv, "/detect"),
                                     data=_npy_bytes(img), method="POST")
        with urllib.request.urlopen(req, timeout=10) as r:
            results[i] = json.load(r)

    threads = [threading.Thread(target=post, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=10)
    assert [r["hw"] for r in results] == [[10 + i, 20] for i in range(6)]
    srv.batcher.close()
    srv.shutdown()
