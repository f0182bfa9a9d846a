"""Visualize RPN anchor assignment on synthetic shapes.

≙ the reference's `viz-iou-dummy.ipynb`: renders GT boxes vs positive /
negative anchors chosen by the on-device target builder.

    python examples/visualize_rpn_targets.py --out /tmp/rpn_targets.png
"""

import argparse

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from objectdetection_tpu import viz  # noqa: E402
from objectdetection_tpu.anchors import config_anchors  # noqa: E402
from objectdetection_tpu.config import SHAPES_CONFIG  # noqa: E402
from objectdetection_tpu.data.shapes import ShapesDataset  # noqa: E402
from objectdetection_tpu.layers.targets import rpn_targets  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="rpn_targets.png")
    p.add_argument("--seed", type=int, default=7)
    args = p.parse_args()

    cfg = SHAPES_CONFIG
    ds = ShapesDataset(1, 128, 128, seed=args.seed)
    batch = ds.load_batch([0], cfg, with_masks=False)

    anchors_norm = jnp.asarray(config_anchors(cfg))
    tgt = rpn_targets(
        anchors_norm,
        jnp.asarray(batch.gt_boxes[0]),
        jnp.asarray(batch.gt_class_ids[0] > 0),
        cfg,
        jax.random.PRNGKey(0),
    )

    h = cfg.image_shape[0]
    scale = np.array([h - 1, h - 1, h - 1, h - 1], np.float32)
    shift = np.array([0, 0, 1, 1], np.float32)
    anchors_pix = np.asarray(anchors_norm) * scale + shift
    gt_pix = batch.gt_boxes[0][batch.gt_class_ids[0] > 0] * scale + shift

    img = viz.draw_anchor_assignment(
        ds.image(0), anchors_pix, np.asarray(tgt.target_class), gt_pix
    )
    import cv2

    cv2.imwrite(args.out, img[:, :, ::-1])
    n_pos = int(np.sum(np.asarray(tgt.target_class) == 1))
    n_neg = int(np.sum(np.asarray(tgt.target_class) == -1))
    print(f"wrote {args.out}: {n_pos} positive, {n_neg} negative anchors")


if __name__ == "__main__":
    main()
