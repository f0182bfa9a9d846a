"""Pallas NMS kernel vs the XLA reference implementation (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from objectdetection_tpu.ops import nms as nms_xla
from objectdetection_tpu.ops.nms_pallas import nms_suppress_pallas


def sorted_inputs(rng, n, clusters=6):
    centers = rng.uniform(0.2, 0.8, (clusters, 2))
    idx = rng.randint(0, clusters, n)
    cy = centers[idx, 0] + rng.normal(0, 0.02, n)
    cx = centers[idx, 1] + rng.normal(0, 0.02, n)
    h = rng.uniform(0.05, 0.2, n)
    w = rng.uniform(0.05, 0.2, n)
    boxes = np.stack([cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], 1).astype(
        np.float32
    )
    scores = rng.uniform(0.01, 1, n).astype(np.float32)
    order = np.argsort(-scores)
    return boxes[order], scores[order]


class TestPallasMatchesXLA:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_suppression_table_matches(self, seed):
        rng = np.random.RandomState(seed)
        n, t = 128, 32
        boxes, _ = sorted_inputs(rng, n)
        cls = np.zeros(n, np.int32)
        out_p = np.asarray(
            nms_suppress_pallas(
                jnp.asarray(boxes), jnp.asarray(cls), 0.5, tile_size=t,
                interpret=True,
            )
        )
        # XLA reference: run its NMS and reconstruct the survivor table
        res = nms_xla.non_max_suppression(
            jnp.asarray(boxes), jnp.asarray(-np.arange(n, dtype=np.float32)),
            n, 0.5, tile_size=t,
        )
        kept = set(np.asarray(res.indices)[np.asarray(res.valid)].tolist())
        survivors_p = {i for i in range(n) if np.abs(out_p[i]).sum() > 0}
        assert survivors_p == kept

    def test_class_aware(self):
        rng = np.random.RandomState(5)
        n, t = 64, 32
        boxes, _ = sorted_inputs(rng, n, clusters=3)
        cls = rng.randint(1, 3, n).astype(np.int32)
        out_p = np.asarray(
            nms_suppress_pallas(
                jnp.asarray(boxes), jnp.asarray(cls), 0.4, tile_size=t,
                interpret=True,
            )
        )
        res = nms_xla.non_max_suppression(
            jnp.asarray(boxes), jnp.asarray(-np.arange(n, dtype=np.float32)),
            n, 0.4, class_ids=jnp.asarray(cls), tile_size=t,
        )
        kept = set(np.asarray(res.indices)[np.asarray(res.valid)].tolist())
        survivors_p = {i for i in range(n) if np.abs(out_p[i]).sum() > 0}
        assert survivors_p == kept

    def test_zero_padding_preserved(self):
        boxes = np.zeros((32, 4), np.float32)
        boxes[0] = [0.1, 0.1, 0.5, 0.5]
        out = np.asarray(
            nms_suppress_pallas(
                jnp.asarray(boxes), jnp.zeros(32, jnp.int32), 0.5,
                tile_size=32, interpret=True,
            )
        )
        np.testing.assert_allclose(out[0], boxes[0])
        np.testing.assert_array_equal(out[1:], 0.0)


class TestBudgetEarlyExit:
    """The production serving path runs nms_suppress_pallas with
    budget = max_output (compacted suppressor buffer + early exit +
    finalize). Pin it in interpret mode: the first `budget` survivors in
    score order must equal the full-pass prefix — greedy NMS's first k
    survivors are invariant to later boxes (ADVICE r2: this combination was
    previously only validated by manual TPU runs)."""

    @pytest.mark.parametrize("seed,budget", [(0, 8), (1, 16), (2, 40)])
    def test_budget_prefix_matches_full_pass(self, seed, budget):
        rng = np.random.RandomState(seed)
        n, t = 256, 32
        boxes, _ = sorted_inputs(rng, n)
        cls = np.zeros(n, np.int32)
        full = np.asarray(
            nms_suppress_pallas(
                jnp.asarray(boxes), jnp.asarray(cls), 0.5, tile_size=t,
                interpret=True,
            )
        )
        budgeted = np.asarray(
            nms_suppress_pallas(
                jnp.asarray(boxes), jnp.asarray(cls), 0.5, tile_size=t,
                budget=budget, interpret=True,
            )
        )
        full_surv = [i for i in range(n) if np.abs(full[i]).sum() > 0]
        bud_surv = [i for i in range(n) if np.abs(budgeted[i]).sum() > 0]
        k = min(budget, len(full_surv))
        # rows are score-sorted, so survivor index order IS score order
        assert bud_surv[:k] == full_surv[:k]
        # and the budgeted rows carry the same boxes
        np.testing.assert_array_equal(
            budgeted[bud_surv[:k]], full[full_surv[:k]]
        )

    def test_budget_class_aware_matches_xla_prefix(self):
        rng = np.random.RandomState(7)
        n, t, budget = 256, 32, 12
        boxes, _ = sorted_inputs(rng, n, clusters=3)
        cls = rng.randint(1, 4, n).astype(np.int32)
        budgeted = np.asarray(
            nms_suppress_pallas(
                jnp.asarray(boxes), jnp.asarray(cls), 0.4, tile_size=t,
                budget=budget, interpret=True,
            )
        )
        res = nms_xla.non_max_suppression(
            jnp.asarray(boxes), jnp.asarray(-np.arange(n, dtype=np.float32)),
            n, 0.4, class_ids=jnp.asarray(cls), tile_size=t,
        )
        kept = np.asarray(res.indices)[np.asarray(res.valid)].tolist()
        bud_surv = [i for i in range(n) if np.abs(budgeted[i]).sum() > 0]
        k = min(budget, len(kept))
        assert bud_surv[:k] == sorted(kept)[:k]
