"""Web UI (apps/webui.py): the gradio-free serving of the reference app
surface — form page, multipart /analyze in both modes, output retrieval."""

import json
import os
import urllib.request

import numpy as np
import pytest


def _multipart(fields: dict, file_field: str, filename: str, payload: bytes):
    boundary = "testboundary123"
    lines = []
    for k, v in fields.items():
        lines += [
            f"--{boundary}".encode(),
            f'Content-Disposition: form-data; name="{k}"'.encode(),
            b"",
            str(v).encode(),
        ]
    lines += [
        f"--{boundary}".encode(),
        (
            f'Content-Disposition: form-data; name="{file_field}"; '
            f'filename="{filename}"'
        ).encode(),
        b"Content-Type: application/octet-stream",
        b"",
        payload,
        f"--{boundary}--".encode(),
        b"",
    ]
    return b"\r\n".join(lines), f"multipart/form-data; boundary={boundary}"


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST")
    req.add_header("Content-Type", ctype)
    try:
        with urllib.request.urlopen(req, timeout=600) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def ui():
    from apps.webui import WebUI

    server = WebUI(port=0, imgsz=64, device_batch=4).start()
    yield server
    server.stop()


def test_root_page_and_healthz(ui):
    with urllib.request.urlopen(f"http://127.0.0.1:{ui.port}/", timeout=30) as r:
        page = r.read().decode()
    assert "Puncture Detection" in page and 'name="judge_wnd"' in page
    with urllib.request.urlopen(
        f"http://127.0.0.1:{ui.port}/healthz", timeout=30
    ) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_analyze_image_mode(ui, tmp_path):
    import cv2

    img = np.zeros((64, 96, 3), np.uint8)
    img[20:44, 30:60] = 230
    ok, enc = cv2.imencode(".png", img)
    assert ok
    body, ctype = _multipart(
        {"mode": "image", "conf": 0.9, "imgsz": 64}, "file", "x.png", enc.tobytes()
    )
    status, j = _post(f"http://127.0.0.1:{ui.port}/analyze", body, ctype)
    assert status == 200, j
    assert j["mode"] == "image" and "detections" in j
    with urllib.request.urlopen(
        f"http://127.0.0.1:{ui.port}{j['output_url']}", timeout=30
    ) as r:
        data = r.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"


def test_analyze_video_mode(ui, tmp_path):
    import cv2

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (96, 64))
    rng = np.random.default_rng(0)
    for i in range(6):
        f = (rng.uniform(0, 0.1, (64, 96, 3)) * 255).astype(np.uint8)
        f[20:44, 8 + i * 8 : 24 + i * 8] = 230
        w.write(f)
    w.release()
    body, ctype = _multipart(
        {"mode": "video", "conf": 0.9, "judge_wnd": 3, "imgsz": 64,
         "crop_size": 64},
        "file", "v.mp4", open(path, "rb").read(),
    )
    status, j = _post(f"http://127.0.0.1:{ui.port}/analyze", body, ctype)
    assert status == 200, j
    assert j["mode"] == "video" and j["n_frames"] == 6
    assert "speed_mm_s" in j and "start_frame" in j
    with urllib.request.urlopen(
        f"http://127.0.0.1:{ui.port}{j['output_url']}", timeout=30
    ) as r:
        data = r.read()
    assert len(data) > 1000  # a real mp4 came back
    # annotated video decodes to the same frame count/geometry
    out = str(tmp_path / "out.mp4")
    with open(out, "wb") as f:
        f.write(data)
    cap = cv2.VideoCapture(out)
    n = 0
    while True:
        ret, frame = cap.read()
        if not ret:
            break
        assert frame.shape == (64, 96, 3)
        n += 1
    cap.release()
    assert n == 6


def test_analyze_rejects_bad_requests(ui):
    body, ctype = _multipart({"mode": "image", "conf": "abc"}, "file", "x.png", b"xx")
    status, j = _post(f"http://127.0.0.1:{ui.port}/analyze", body, ctype)
    assert status == 400 and "numeric" in j["error"]
    status, j = _post(f"http://127.0.0.1:{ui.port}/analyze", b"notmultipart", "text/plain")
    assert status == 400
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(
            f"http://127.0.0.1:{ui.port}/outputs/doesnotexist.mp4", timeout=30
        )
    assert exc.value.code == 404
