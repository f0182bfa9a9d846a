"""Checkpoint tests: orbax round-trip + matterport-h5 conversion.

The h5 fixture synthesizes a file with the exact matterport layout the
reference loader walks (`load_params.py:105-135`): per-layer double-nested
groups, `:0`-suffixed datasets, the `rpn_model` nesting quirk, Keras deconv
kernel layout.
"""

import numpy as np
import h5py
import jax
import jax.numpy as jnp
import pytest

from objectdetection_tpu import checkpoint, detector
from objectdetection_tpu.config import SHAPES_CONFIG

CFG = SHAPES_CONFIG


@pytest.fixture(scope="module")
def variables():
    return detector.init_variables(CFG, jax.random.PRNGKey(0))


def synth_h5(path, variables):
    """Write a matterport-layout h5 matching the model's shapes."""
    rng = np.random.RandomState(7)

    def fill(grp, name, shape):
        grp.create_dataset(name, data=rng.randn(*shape).astype(np.float32))

    with h5py.File(path, "w") as f:
        flat = jax.tree_util.tree_flatten_with_path(variables)[0]
        for p, leaf in flat:
            keys = [getattr(k, "key", str(k)) for k in p]
            layer, leaf_name = keys[-2], keys[-1]
            if layer.startswith("rpn_"):
                grp = f.require_group("rpn_model").require_group(layer)
            else:
                grp = f.require_group(layer).require_group(layer)
            shape = np.asarray(leaf).shape
            is_bn = layer.startswith("bn") or "_bn" in layer
            name = (
                checkpoint._BN_LEAF_MAP[leaf_name]
                if is_bn
                else checkpoint._CONV_LEAF_MAP[leaf_name]
            )
            if name in grp:
                continue
            # store in the reference's on-disk layouts
            if leaf_name == "kernel" and layer == "mrcnn_class_conv1":
                shape = (7, 7, shape[0] // 49, shape[1])
            elif leaf_name == "kernel" and layer == "mrcnn_class_conv2":
                shape = (1, 1, shape[0], shape[1])
            elif leaf_name == "kernel" and layer == "mrcnn_mask_deconv":
                shape = (shape[0], shape[1], shape[3], shape[2])
            fill(grp, name, shape)


class TestMatterportH5:
    def test_full_load_replaces_everything(self, variables, tmp_path):
        h5p = str(tmp_path / "w.h5")
        synth_h5(h5p, variables)
        loaded = checkpoint.load_matterport_h5(h5p, variables)
        # structure preserved
        assert jax.tree_util.tree_structure(loaded) == jax.tree_util.tree_structure(
            variables
        )
        # every leaf replaced (random h5 values ≠ init values)
        changed = jax.tree.map(
            lambda a, b: bool(jnp.any(a != b)), variables, loaded
        )
        assert all(jax.tree.leaves(changed))

    def test_heads_skip_list_keeps_random_init(self, variables, tmp_path):
        h5p = str(tmp_path / "w.h5")
        synth_h5(h5p, variables)
        loaded = checkpoint.load_matterport_h5(
            h5p, variables, skip_layers=checkpoint.HEADS_LAYERS
        )
        p0 = variables["params"]["mrcnn"]["mrcnn_class_logits"]["kernel"]
        p1 = loaded["params"]["mrcnn"]["mrcnn_class_logits"]["kernel"]
        np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
        # but backbone was loaded
        b0 = variables["params"]["fpn"]["resnet"]["conv1"]["kernel"]
        b1 = loaded["params"]["fpn"]["resnet"]["conv1"]["kernel"]
        assert np.any(np.asarray(b0) != np.asarray(b1))

    def test_missing_layer_strict_raises(self, variables, tmp_path):
        h5p = str(tmp_path / "partial.h5")
        with h5py.File(h5p, "w") as f:
            f.require_group("conv1").require_group("conv1")
        with pytest.raises(KeyError):
            checkpoint.load_matterport_h5(h5p, variables, strict=True)

    def test_shape_mismatch_strict_raises(self, variables, tmp_path):
        h5p = str(tmp_path / "bad.h5")
        synth_h5(h5p, variables)
        with h5py.File(h5p, "r+") as f:
            del f["conv1"]["conv1"]["kernel:0"]
            f["conv1"]["conv1"].create_dataset(
                "kernel:0", data=np.zeros((3, 3, 3, 64), np.float32)
            )
        with pytest.raises(ValueError):
            checkpoint.load_matterport_h5(h5p, variables)

    def test_loaded_weights_run_inference(self, variables, tmp_path):
        h5p = str(tmp_path / "w.h5")
        synth_h5(h5p, variables)
        loaded = checkpoint.load_matterport_h5(h5p, variables)
        cfg = CFG.replace(
            pre_nms_rois_count=256, post_nms_rois_inference=32
        )
        infer = detector.make_infer_fn(cfg, with_masks=False)
        det = infer(
            loaded,
            jnp.zeros((1, 128, 128, 3)),
            jnp.asarray([[0.0, 0.0, 128.0, 128.0]]),
        )
        assert np.isfinite(np.asarray(det.boxes)).all()


class TestDeconvSemantics:
    def test_keras_conv2dtranspose_conversion(self):
        """The h5 deconv kernel must be channel-swapped AND spatially flipped
        to reproduce Keras Conv2DTranspose outputs in flax ConvTranspose."""
        import flax.linen as nn

        rng = np.random.RandomState(0)
        cin, cout = 3, 5
        x = rng.randn(1, 4, 4, cin).astype(np.float32)
        k_keras = rng.randn(2, 2, cout, cin).astype(np.float32)

        # direct Keras semantics for a 2x2 stride-2 deconv
        expected = np.zeros((1, 8, 8, cout), np.float32)
        for i in range(4):
            for j in range(4):
                for dy in range(2):
                    for dx in range(2):
                        expected[0, 2 * i + dy, 2 * j + dx] = (
                            x[0, i, j] @ k_keras[dy, dx].T
                        )

        converted = checkpoint._adapt_shape(
            "mrcnn_mask_deconv", "kernel", k_keras, (2, 2, cin, cout), True
        )
        mod = nn.ConvTranspose(cout, (2, 2), strides=(2, 2))
        out = mod.apply(
            {"params": {"kernel": jnp.asarray(converted.copy()),
                        "bias": jnp.zeros(cout)}},
            jnp.asarray(x),
        )
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


class TestOrbax:
    def test_roundtrip(self, variables, tmp_path):
        path = str(tmp_path / "ckpt")
        checkpoint.save_checkpoint(path, variables)
        like = jax.tree.map(np.zeros_like, variables)
        restored = checkpoint.load_checkpoint(path, like)
        same = jax.tree.map(
            lambda a, b: bool(jnp.all(jnp.asarray(a) == jnp.asarray(b))),
            variables,
            restored,
        )
        assert all(jax.tree.leaves(same))
