"""Exercise the gradio Blocks wiring (VERDICT.md round-1 item 10).

gradio cannot be installed here (no egress), so a minimal test-double of the
gradio API surface used by apps/app.py (Blocks/Row/Column contexts, components,
update, .change/.click event registration) is injected as ``sys.modules
['gradio']``.  The test builds the UI and asserts the reference contract
(/root/reference/yolo_seg/app.py:205-325): component defaults (conf 0.9, judge
window 20, model dropdown choices), the visibility-toggle callback, and the
detect-button dispatch into yolo_inference.
"""

import sys
import types

import pytest


class _Component:
    def __init__(self, kind, **kw):
        self.kind = kind
        self.kw = kw
        self.change_calls = []
        self.click_calls = []

    def change(self, fn, inputs, outputs):
        self.change_calls.append((fn, inputs, outputs))

    def click(self, fn, inputs, outputs):
        self.click_calls.append((fn, inputs, outputs))


class _Ctx:
    def __init__(self, registry, kind):
        registry.append(self)
        self.kind = kind

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _make_gradio_double():
    gr = types.ModuleType("gradio")
    gr._components = []
    gr._contexts = []

    def comp(kind):
        def ctor(*a, **kw):
            c = _Component(kind, **kw)
            if a:
                c.kw["_args"] = a
            gr._components.append(c)
            return c

        return ctor

    class Blocks(_Ctx):
        def __init__(self, *a, **kw):
            super().__init__(gr._contexts, "Blocks")

        def launch(self, **kw):
            self.launched = kw

    gr.Blocks = Blocks
    gr.Row = lambda *a, **k: _Ctx(gr._contexts, "Row")
    gr.Column = lambda *a, **k: _Ctx(gr._contexts, "Column")
    for kind in ("HTML", "Image", "Video", "Radio", "Dropdown", "Slider", "Button"):
        setattr(gr, kind, comp(kind))
    gr.update = lambda **kw: {"__update__": True, **kw}
    return gr


@pytest.fixture()
def gradio_double(monkeypatch):
    gr = _make_gradio_double()
    monkeypatch.setitem(sys.modules, "gradio", gr)
    return gr


def test_blocks_wiring_matches_reference_contract(gradio_double):
    from apps.app import build_gradio_app

    demo = build_gradio_app()
    assert demo.kind == "Blocks"
    comps = {id(c): c for c in gradio_double._components}

    sliders = [c for c in comps.values() if c.kind == "Slider"]
    assert any(c.kw.get("value") == 0.9 for c in sliders), "conf default 0.9"
    assert any(c.kw.get("value") == 20 for c in sliders), "judge window default 20"

    drops = [c for c in comps.values() if c.kind == "Dropdown"]
    yolo_drop = next(c for c in drops if c.kw.get("label") == "YOLO Model")
    assert "seg/yolo11n-seg-finetune.pt" in yolo_drop.kw["choices"]
    assert yolo_drop.kw["value"] == "seg/yolo11n-seg-finetune.pt"

    radios = [c for c in comps.values() if c.kind == "Radio"]
    assert radios and radios[0].kw["value"] == "Video"

    buttons = [c for c in comps.values() if c.kind == "Button"]
    assert len(buttons) == 1 and len(buttons[0].click_calls) == 1
    fn, inputs, outputs = buttons[0].click_calls[0]
    assert len(inputs) == 8 and len(outputs) == 2

    assert len(radios[0].change_calls) == 1


def test_visibility_toggle_callback(gradio_double):
    from apps.app import build_gradio_app

    build_gradio_app()
    radio = next(c for c in gradio_double._components if c.kind == "Radio")
    vis_fn = radio.change_calls[0][0]
    ups = vis_fn("Image")
    assert [u["visible"] for u in ups] == [True, False, True, False]
    ups = vis_fn("Video")
    assert [u["visible"] for u in ups] == [False, True, False, True]


def test_button_dispatch_routes_image_vs_video(gradio_double, monkeypatch):
    import apps.app as app_mod

    calls = []

    def fake_inference(image, video, ym, um, cm, conf, judge):
        calls.append((image, video, ym, um, cm, conf, judge))
        return ("img_out", "vid_out")

    monkeypatch.setattr(app_mod, "yolo_inference", fake_inference)
    demo = app_mod.build_gradio_app()
    btn = next(c for c in gradio_double._components if c.kind == "Button")
    run_fn = btn.click_calls[0][0]

    run_fn("IMG", None, "y.pt", "u.pth", "c.tar", 0.9, 20.0, "Image")
    assert calls[-1][0] == "IMG" and calls[-1][1] is None
    assert calls[-1][6] == 20 and isinstance(calls[-1][6], int)

    run_fn(None, "VID.mp4", "y.pt", "u.pth", "c.tar", 0.35, 25.0, "Video")
    assert calls[-1][0] is None and calls[-1][1] == "VID.mp4"
