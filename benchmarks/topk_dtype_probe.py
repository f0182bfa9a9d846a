"""Does bf16 score top-k help? [B, 262144] -> top 6000 selection cost in
f32 vs bf16, plus the selection-set recall cost of bf16 rounding.

The proposal layer's approx_max_k measures ~27 ms/batch96 — the largest
proposal-stage item after the budgeted NMS rewrite. Scores are softmax
probabilities in [0, 1]; bf16 keeps ~3 significant digits, so near-ties
reorder — but near-tie membership in the pre-NMS 6000 barely moves the
post-NMS survivor set (cf. approx_topk_recall.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, A, K = 96, 261888, 6000


def timed(label, fn, *args):
    f = jax.jit(fn)
    jax.block_until_ready(f(*args))

    @jax.jit
    def many(n, *a):
        def body(_, carry):
            x, acc = carry
            r = fn(x, *a[1:])
            acc = acc + jnp.sum(r[0].astype(jnp.float32)) * 1e-9
            x = x + (1e-20 * acc).astype(x.dtype)
            return x, acc

        _, acc = jax.lax.fori_loop(0, n, body, (a[0], jnp.float32(0)))
        return acc

    float(many(jnp.int32(1), *args))
    t0 = time.time(); float(many(jnp.int32(1), *args)); t1 = time.time() - t0
    t0 = time.time(); float(many(jnp.int32(5), *args)); tm = time.time() - t0
    ms = 1000 * max(tm - t1, 0) / 4
    print(f"{label:40s} {ms:8.2f} ms/batch{B}", flush=True)


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    rng = np.random.RandomState(0)
    fg = rng.rand(B, A) < 0.02
    scores = np.where(
        fg, 0.5 + 0.5 * rng.rand(B, A), 0.02 * rng.rand(B, A)
    ).astype(np.float32)
    s32 = jnp.asarray(scores)
    s16 = s32.astype(jnp.bfloat16)

    vm = lambda f: jax.vmap(f)
    timed("lax.top_k f32", vm(lambda x: jax.lax.top_k(x, K)), s32)
    timed(
        "approx_max_k f32",
        vm(lambda x: jax.lax.approx_max_k(x, K, recall_target=0.98)),
        s32,
    )
    timed(
        "approx_max_k bf16",
        vm(lambda x: jax.lax.approx_max_k(x, K, recall_target=0.98)),
        s16,
    )
    timed("lax.top_k bf16", vm(lambda x: jax.lax.top_k(x, K)), s16)

    # recall of the f32 exact top-K set inside the bf16 approx selection
    exact = np.asarray(jax.jit(vm(lambda x: jax.lax.top_k(x, K)[1]))(s32))
    approx16 = np.asarray(
        jax.jit(
            vm(lambda x: jax.lax.approx_max_k(x, K, recall_target=0.98)[1])
        )(s16)
    )
    r = np.mean(
        [len(set(e) & set(a)) / K for e, a in zip(exact, approx16)]
    )
    r1k = np.mean(
        [len(set(e[:1000]) & set(a)) / 1000 for e, a in zip(exact, approx16)]
    )
    print(f"bf16-approx recall of f32 top-{K}: {r:.4f}; of top-1000: {r1k:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
