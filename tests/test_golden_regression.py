"""End-to-end numeric regression tests against committed golden arrays.

The reference's de-facto integration tests were pickled stage outputs
(SURVEY.md §4.3); here the same idea is a committed golden file: a fixed
seed, a fixed tiny config, and stored stage outputs. Any refactor that
changes pipeline numerics beyond tolerance fails loudly.

Regenerate (after an INTENTIONAL numerics change) with:
    python tests/test_golden_regression.py --regen

Regenerate ON THE BACKEND THE TEST RUNS ON (CI = CPU): the int8 fixtures
pin quant.int8_conv's f32 CPU simulation, which is only bit-equal to the
TPU int32 MXU path while per-output accumulation stays below 2^24 — CPU
goldens are not transferable to TPU results and vice versa (see
quant.int8_conv).
"""

import os

import numpy as np
import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "e2e_small.npz")


def _compute_outputs():
    import jax
    import jax.numpy as jnp

    from objectdetection_tpu.config import SHAPES_CONFIG
    from objectdetection_tpu import detector
    from objectdetection_tpu.data.shapes import ShapesDataset

    cfg = SHAPES_CONFIG.replace(
        image_shape=(64, 64, 3),
        image_min_dim=64,
        image_max_dim=64,
        pre_nms_rois_count=128,
        post_nms_rois_training=48,
        post_nms_rois_inference=32,
        train_rois_per_image=8,
        rpn_train_anchors_per_image=32,
        max_gt_objects=4,
        compute_dtype="float32",  # golden comparisons want full precision
    )
    variables = detector.init_variables(cfg, jax.random.PRNGKey(42))
    ds = ShapesDataset(2, 64, 64, seed=123)
    batch = ds.load_batch([0, 1], cfg, with_masks=True, use_native=False)
    windows = jnp.tile(jnp.asarray([[0.0, 0.0, 64.0, 64.0]]), (2, 1))

    det, inter = detector.forward_inference(
        variables,
        jnp.asarray(batch.images),
        windows,
        cfg,
        with_masks=True,
        return_intermediates=True,
    )
    losses = detector.compute_losses(
        variables,
        jax.tree.map(jnp.asarray, batch),
        cfg,
        jax.random.PRNGKey(7),
        with_masks=True,
    )
    return {
        "proposals": np.asarray(inter["proposals"]),
        "rpn_probs_sample": np.asarray(inter["rpn_class_probs"][:, ::97, :]),
        "detections": np.asarray(inter["detections"]),
        "mask_mean": np.asarray(det.masks.mean(axis=(2, 3))),
        **{f"loss_{k}": np.asarray(v) for k, v in losses.items()},
    }


@pytest.mark.slow  # compile/interpret-heavy: run via `pytest -m ""` or CI
class TestGoldenRegression:
    @pytest.fixture(scope="class")
    def outputs(self):
        return _compute_outputs()

    def test_golden_file_exists(self):
        assert os.path.exists(GOLDEN_PATH), (
            "golden file missing — run `python tests/test_golden_regression.py --regen`"
        )

    def test_all_stages_match(self, outputs):
        golden = dict(np.load(GOLDEN_PATH))
        assert set(golden) == set(outputs), (
            sorted(golden),
            sorted(outputs),
        )
        for key in sorted(golden):
            np.testing.assert_allclose(
                outputs[key],
                golden[key],
                rtol=2e-3,
                atol=2e-4,
                err_msg=f"stage {key!r} drifted from golden",
            )


if __name__ == "__main__":
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import conftest  # noqa: F401  (force CPU the same way pytest does)

    if "--regen" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, **_compute_outputs())
        print(f"wrote {GOLDEN_PATH}")
    else:
        print(__doc__)
