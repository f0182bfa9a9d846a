"""HTTP server tests with a stubbed inference function (no model compile)."""

import json
import threading
import urllib.error
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

import jax.numpy as jnp

from objectdetection_tpu.config import DetectorConfig
from objectdetection_tpu.detector import Detections
from objectdetection_tpu.serve import build_handler

CFG = DetectorConfig(image_shape=(128, 128, 3), image_min_dim=100,
                     image_max_dim=128, num_classes=4)


def fake_infer(variables, images, windows):
    """One confident detection covering the middle of the window."""
    n = CFG.detection_post_nms_instances
    boxes = jnp.zeros((1, n, 4)).at[0, 0].set(jnp.asarray([0.2, 0.2, 0.6, 0.6]))
    cls = jnp.zeros((1, n), jnp.int32).at[0, 0].set(2)
    scores = jnp.zeros((1, n)).at[0, 0].set(0.91)
    return Detections(
        boxes=boxes, class_ids=cls, scores=scores, valid=scores > 0, masks=None
    )


@pytest.fixture(scope="module")
def server():
    handler = build_handler(fake_infer, {}, CFG, ["bg", "a", "b", "c"])
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


class TestServer:
    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz") as r:
            assert json.loads(r.read()) == {"status": "ok"}

    def test_detect_roundtrip(self, server):
        import cv2

        img = (np.random.RandomState(0).rand(96, 120, 3) * 255).astype(np.uint8)
        ok, jpg = cv2.imencode(".jpg", img)
        req = urllib.request.Request(
            f"{server}/detect", data=jpg.tobytes(), method="POST"
        )
        with urllib.request.urlopen(req) as r:
            out = json.loads(r.read())
        assert len(out["detections"]) == 1
        d = out["detections"][0]
        assert d["class_name"] == "b" and d["score"] == 0.91
        y1, x1, y2, x2 = d["box_yxyx"]
        assert 0 <= y1 < y2 <= 96 and 0 <= x1 < x2 <= 120

    def test_garbage_body_400(self, server):
        req = urllib.request.Request(
            f"{server}/detect", data=b"not an image", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400

    def test_wrong_path_404(self, server):
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{server}/nope")
        assert e.value.code == 404

    def test_empty_body_400(self, server):
        req = urllib.request.Request(
            f"{server}/detect", data=b"", method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400
