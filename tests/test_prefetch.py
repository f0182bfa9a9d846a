"""Prefetcher + inference-cast utility tests."""

import time

import numpy as np
import pytest

from objectdetection_tpu.data.prefetch import Prefetcher


class TestPrefetcher:
    def test_yields_in_order(self):
        pf = Prefetcher(lambda step: step * 10, num_steps=5, depth=2)
        got = [pf.get() for _ in range(5)]
        assert got == [0, 10, 20, 30, 40]
        with pytest.raises(StopIteration):
            pf.get()
        pf.close()

    def test_overlaps_slow_producer(self):
        def slow(step):
            time.sleep(0.05)
            return step

        pf = Prefetcher(slow, num_steps=4, depth=2)
        time.sleep(0.15)  # let the worker run ahead
        t0 = time.time()
        _ = [pf.get() for _ in range(2)]
        assert time.time() - t0 < 0.04  # already buffered
        pf.close()

    def test_error_propagates(self):
        def boom(step):
            if step == 1:
                raise ValueError("producer failed")
            return step

        pf = Prefetcher(boom, num_steps=5, depth=2)
        assert pf.get() == 0
        with pytest.raises(ValueError):
            pf.get()
        pf.close()

    def test_iterator_interface(self):
        pf = Prefetcher(lambda s: s, num_steps=3)
        assert list(pf) == [0, 1, 2]
        pf.close()

    def test_close_mid_stream(self):
        pf = Prefetcher(lambda s: s, num_steps=1000, depth=2)
        assert pf.get() == 0
        pf.close()  # must not hang


class TestCastParams:
    def test_floats_cast_ints_kept(self):
        import jax.numpy as jnp

        from objectdetection_tpu.checkpoint import cast_params_for_inference

        tree = {
            "w": jnp.ones((4, 4), jnp.float32),
            "step": jnp.asarray(3, jnp.int32),
            "nested": {"b": jnp.zeros((2,), jnp.float32)},
        }
        out = cast_params_for_inference(tree)
        assert out["w"].dtype == jnp.bfloat16
        assert out["nested"]["b"].dtype == jnp.bfloat16
        assert out["step"].dtype == jnp.int32
