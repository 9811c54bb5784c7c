"""HTTP serving endpoint (apps/serve.py): dynamic batching into padded
static-shape device batches, JSON predict surface, health/stats."""

import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import cv2  # noqa: F401  (decode path requirement)

    from apps.serve import Server
    from yolo_puncture_tpu.predict import YOLO

    model = YOLO("yolov8n-seg", nc=1, max_det=8, max_masks=4)
    s = Server(model, imgsz=64, max_batch=4, window_ms=20.0).start()
    yield s
    s.stop()


def _url(server, path):
    return f"http://127.0.0.1:{server.port}{path}"


def _post_jpeg(server, frame, query=""):
    import cv2

    ok, buf = cv2.imencode(".jpg", frame)
    assert ok
    req = urllib.request.Request(
        _url(server, "/predict" + query), data=buf.tobytes(), method="POST",
        headers={"Content-Type": "image/jpeg"},
    )
    with urllib.request.urlopen(req, timeout=300) as resp:
        return resp.status, json.loads(resp.read())


def test_healthz_and_404(server):
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as r:
        assert json.loads(r.read())["status"] == "ok"
    try:
        urllib.request.urlopen(_url(server, "/nope"), timeout=30)
        assert False, "404 expected"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_predict_endpoint(server):
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 255, (48, 64, 3), np.uint8)
    status, out = _post_jpeg(server, frame, "?conf=0.01&retina=1")
    assert status == 200
    assert set(out) >= {"boxes", "conf", "cls", "polygons", "batch"}
    for box in out["boxes"]:
        x1, y1, x2, y2 = box
        assert 0 <= x1 <= x2 <= 64 and 0 <= y1 <= y2 <= 48
    assert len(out["conf"]) == len(out["boxes"]) == len(out["cls"])


def test_predict_rejects_garbage(server):
    req = urllib.request.Request(
        _url(server, "/predict"), data=b"not an image", method="POST"
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "400 expected"
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_concurrent_requests_batch(server):
    """Simultaneous same-shape requests coalesce into one padded device batch."""
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, (48, 64, 3), np.uint8) for _ in range(3)]
    out = [None] * 3

    def worker(i):
        out[i] = _post_jpeg(server, frames[i], "?conf=0.01")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=360)
    assert all(o is not None and o[0] == 200 for o in out)
    with urllib.request.urlopen(_url(server, "/stats"), timeout=30) as r:
        stats = json.loads(r.read())
    assert stats["requests"] >= 4  # the earlier predict tests + these
    assert stats["batches"] >= 1
    # at least one multi-request batch happened OR all were singles — either
    # way the padded-frame count is a multiple of power-of-two group sizes
    assert stats["batched_frames"] >= stats["requests"]


def test_pad_pow2():
    from apps.serve import _pad_pow2

    assert [_pad_pow2(n, 16) for n in (1, 2, 3, 4, 5, 9, 17)] == [1, 2, 4, 4, 8, 16, 16]
