"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.config import SHAPES_CONFIG
from objectdetection_tpu import detector, parallel

CFG = SHAPES_CONFIG.replace(
    image_shape=(64, 64, 3),
    image_min_dim=64,
    image_max_dim=64,
    pre_nms_rois_count=128,
    post_nms_rois_training=32,
    post_nms_rois_inference=32,
    train_rois_per_image=8,
    rpn_train_anchors_per_image=32,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return parallel.make_mesh(8)


@pytest.fixture(scope="module")
def variables():
    return detector.init_variables(CFG, jax.random.PRNGKey(0))


def _batch(b):
    rng = np.random.RandomState(0)
    return detector.TrainBatch(
        images=rng.rand(b, 64, 64, 3).astype(np.float32),
        gt_boxes=np.tile(
            np.array([[[0.1, 0.1, 0.5, 0.5], [0, 0, 0, 0]]], np.float32),
            (b, 1, 1),
        ),
        gt_class_ids=np.tile(np.array([[1, 0]], np.int32), (b, 1)),
        gt_masks=None,
        active_class_ids=np.ones((b, CFG.num_classes), np.int32),
    )


class TestMesh:
    def test_mesh_shape(self, mesh):
        assert mesh.devices.shape == (8,)
        assert mesh.axis_names == ("data",)

    def test_shard_batch_layout(self, mesh):
        batch = parallel.shard_batch(_batch(8), mesh)
        shards = batch.images.addressable_shards
        assert len(shards) == 8
        assert shards[0].data.shape == (1, 64, 64, 3)


class TestParallelInference:
    def test_matches_single_device(self, mesh, variables):
        batch = _batch(8)
        windows = np.tile(np.array([[0.0, 0.0, 64.0, 64.0]]), (8, 1)).astype(
            np.float32
        )
        par = parallel.make_parallel_infer_fn(CFG, mesh, with_masks=False)
        images_sh = jax.device_put(
            jnp.asarray(batch.images), parallel.batch_sharding(mesh)
        )
        windows_sh = jax.device_put(
            jnp.asarray(windows), parallel.batch_sharding(mesh)
        )
        det_p = par(variables, images_sh, windows_sh)

        single = detector.make_infer_fn(CFG, with_masks=False)
        det_s = single(variables, jnp.asarray(batch.images), jnp.asarray(windows))

        np.testing.assert_allclose(
            np.asarray(det_p.boxes), np.asarray(det_s.boxes), atol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(det_p.class_ids), np.asarray(det_s.class_ids)
        )


@pytest.mark.slow  # compile/interpret-heavy: run via `pytest -m ""` or CI
class TestTensorParallel:
    def test_dp_tp_mesh_step_matches_replicated(self):
        mesh2d = parallel.make_dp_tp_mesh(dp=4, tp=2)
        assert mesh2d.shape == {"data": 4, "model": 2}
        batch = _batch(8)
        rng = jax.random.PRNGKey(1)

        # replicated reference (fresh state: the step donates its input)
        state = detector.create_train_state(CFG, jax.random.PRNGKey(0))
        mesh1d = parallel.make_mesh(8)
        step_dp = parallel.make_parallel_train_step(CFG, mesh1d)
        s_dp, m_dp = step_dp(
            parallel.replicate_state(state, mesh1d),
            parallel.shard_batch(batch, mesh1d),
            rng,
        )

        # dp×tp (independent state instance — deterministic init)
        state2 = detector.create_train_state(CFG, jax.random.PRNGKey(0))
        state_tp = parallel.shard_state_tp(state2, mesh2d)
        # the box-head kernel must actually be sharded over `model`
        k = state_tp.params["mrcnn"]["mrcnn_class_conv1"]["kernel"]
        assert not k.sharding.is_fully_replicated
        step_tp = parallel.make_tp_train_step(CFG, mesh2d)
        s_tp, m_tp = step_tp(state_tp, batch, rng)

        np.testing.assert_allclose(
            float(m_tp["total_loss"]), float(m_dp["total_loss"]), rtol=1e-4
        )


@pytest.mark.slow  # compile/interpret-heavy: run via `pytest -m ""` or CI
class TestParallelTraining:
    def test_step_runs_and_losses_match_global(self, mesh):
        state = detector.create_train_state(CFG, jax.random.PRNGKey(0))
        state_r = parallel.replicate_state(state, mesh)
        batch = parallel.shard_batch(_batch(8), mesh)
        step = parallel.make_parallel_train_step(CFG, mesh)
        new_state, metrics = step(state_r, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["total_loss"]))
        assert int(new_state.step) == 1
        # params updated and still replicated
        leaf = jax.tree.leaves(new_state.params)[0]
        assert leaf.sharding.is_fully_replicated
