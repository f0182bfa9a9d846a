"""Minimal inference server (stdlib HTTP, JSON detections).

The framework's serving entry point: POST an image, get boxes / classes /
scores back as JSON (box path; masks are an inference-API feature, not
exposed over HTTP). Stateless, one warm jitted program, batch-of-one per
request (batching across requests is a front-end concern).

    odtpu serve --port 8000 [--weights mask_rcnn_coco.h5]
    curl -s --data-binary @photo.jpg localhost:8000/detect | jq .
"""

from __future__ import annotations

import json
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional


def build_handler(infer_fn, variables, config, class_names):
    import cv2
    import jax.numpy as jnp
    import numpy as np

    from objectdetection_tpu.data.preprocess import mold_image_host

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):
            pass

        def _json(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            else:
                self._json(404, {"error": "use POST /detect or GET /healthz"})

        def do_POST(self):
            if self.path != "/detect":
                self._json(404, {"error": "POST /detect"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length == 0 or length > 64 * 1024 * 1024:
                self._json(400, {"error": "missing or oversized body"})
                return
            raw = self.rfile.read(length)
            buf = np.frombuffer(raw, np.uint8)
            bgr = cv2.imdecode(buf, cv2.IMREAD_COLOR)
            if bgr is None:
                self._json(400, {"error": "could not decode image"})
                return
            rgb = bgr[:, :, ::-1]

            t0 = time.time()
            molded, window, _ = mold_image_host(rgb, config)
            det = infer_fn(
                variables,
                jnp.asarray(molded[None]),
                jnp.asarray(window[None].astype(np.float32)),
            )
            from objectdetection_tpu.data.preprocess import unmold_detections

            boxes, cls, scores, valid = unmold_detections(
                jnp.concatenate(
                    [
                        det.boxes[0],
                        det.class_ids[0][:, None].astype(jnp.float32),
                        det.scores[0][:, None],
                    ],
                    axis=1,
                ),
                jnp.asarray(window.astype(np.float32)),
                config.image_shape[:2],
                jnp.asarray(rgb.shape[:2]),
            )
            v = np.asarray(valid)
            out = {
                "latency_ms": round(1000 * (time.time() - t0), 1),
                "detections": [
                    {
                        "box_yxyx": [int(x) for x in np.asarray(boxes)[i]],
                        "class_id": int(np.asarray(cls)[i]),
                        "class_name": (
                            class_names[int(np.asarray(cls)[i])]
                            if class_names
                            and int(np.asarray(cls)[i]) < len(class_names)
                            else str(int(np.asarray(cls)[i]))
                        ),
                        "score": round(float(np.asarray(scores)[i]), 4),
                    }
                    for i in np.where(v)[0]
                ],
            }
            self._json(200, out)

    return Handler


def serve(
    port: int = 8000,
    weights: Optional[str] = None,
    host: str = "127.0.0.1",
    config=None,
    class_names=None,
    block: bool = True,
    quantized: Optional[str] = None,
):
    """Start the HTTP inference server.

    `quantized` is the directory of a persisted int8 artifact produced by
    `odtpu quantize` (checkpoint.save_quantized): the calibrated + frozen
    variables load in seconds and inference runs the int8 MXU path.
    """
    import jax

    from objectdetection_tpu import checkpoint, detector
    from objectdetection_tpu.config import COCO_CONFIG
    from objectdetection_tpu.data.coco import COCO_CLASS_NAMES
    from objectdetection_tpu.metrics import enable_compilation_cache

    # persist XLA compilations: a cold COCO-scale compile costs ~5 min on
    # the TPU relay; a restarted server deserializes instead
    enable_compilation_cache()

    cfg = config or COCO_CONFIG
    if class_names is None:
        class_names = COCO_CLASS_NAMES
    if quantized:
        variables = jax.device_put(checkpoint.load_quantized(quantized))
        if "pooled_box_scale" not in variables.get("quant", {}):
            raise ValueError(
                f"stale int8 artifact {quantized}: missing the pooled-ROI "
                "scales introduced by cfg.int8_pooled — regenerate with "
                "`odtpu quantize`"
            )
        meta = checkpoint.load_quant_meta(quantized)
        if meta is not None:
            # artifact records the exact gate settings it was calibrated
            # with (each changes the variable-tree layout)
            cfg = cfg.replace(
                quantized_inference=True,
                per_channel_acts=meta["per_channel_acts"],
                quantize_rpn=meta["quantize_rpn"],
                quantize_box_head=meta["quantize_box_head"],
                quantize_mask_head=meta["quantize_mask_head"],
                # key absent in pre-gate artifacts (gate default: quantized)
                quantize_fpn_p2=meta.get("quantize_fpn_p2", True),
            )
        else:
            # pre-metadata artifact: sniff per-channel from [C] out_scale
            # vectors (head gates assumed default-on)
            per_channel = any(
                leaf.ndim == 1 and getattr(path[-1], "key", "") == "out_scale"
                for path, leaf in jax.tree_util.tree_flatten_with_path(
                    variables.get("quant", {})
                )[0]
            )
            cfg = cfg.replace(
                quantized_inference=True, per_channel_acts=per_channel
            )
    else:
        variables = detector.init_variables(cfg, jax.random.PRNGKey(0))
        if weights:
            variables = checkpoint.load_matterport_h5(weights, variables)
        # serving is inference-only: pre-cast weights to the compute dtype once
        variables = checkpoint.cast_params_for_inference(variables)
    infer_fn = detector.make_infer_fn(cfg, with_masks=False)

    # warm the compile before accepting traffic
    import jax.numpy as jnp

    d = cfg.image_max_dim
    _ = infer_fn(
        variables,
        jnp.zeros((1, d, d, 3)),
        jnp.asarray([[0.0, 0.0, float(d), float(d)]]),
    )

    handler = build_handler(infer_fn, variables, cfg, class_names)
    server = ThreadingHTTPServer((host, port), handler)
    print(f"serving on http://{host}:{port} (POST /detect, GET /healthz)")
    if block:
        server.serve_forever()
    return server
