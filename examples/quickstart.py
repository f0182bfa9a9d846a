"""Library quickstart: train briefly on shapes, then run inference.

    PYTHONPATH=. python examples/quickstart.py
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from objectdetection_tpu import detector  # noqa: E402
from objectdetection_tpu.config import SHAPES_CONFIG  # noqa: E402
from objectdetection_tpu.data.shapes import ShapesDataset  # noqa: E402


def main():
    cfg = SHAPES_CONFIG.replace(
        pre_nms_rois_count=512, post_nms_rois_training=128,
        post_nms_rois_inference=64, train_rois_per_image=16,
    )

    # --- training: one jitted step, optimizer included -------------------
    ds = ShapesDataset(16, 128, 128, seed=0)
    state = detector.create_train_state(cfg, jax.random.PRNGKey(0))
    step = detector.make_train_step(cfg, with_masks=True)
    for i in range(5):
        batch = jax.tree.map(
            jnp.asarray, ds.load_batch([2 * i, 2 * i + 1], cfg, with_masks=True)
        )
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        print(f"step {i}: total_loss={float(metrics['total_loss']):.3f}")

    # --- inference: one jitted program, boxes + classes + masks ----------
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    infer = detector.make_infer_fn(cfg, with_masks=True)
    batch = ds.load_batch([10, 11], cfg, with_masks=False)
    windows = jnp.tile(jnp.asarray([[0.0, 0.0, 128.0, 128.0]]), (2, 1))
    det = infer(variables, jnp.asarray(batch.images), windows)
    for b in range(2):
        n = int(np.asarray(det.valid[b]).sum())
        print(f"image {b}: {n} detections, mask grid {det.masks.shape[2:]} each")


if __name__ == "__main__":
    main()
