"""Does jnp.take row-gather throughput scale with row WIDTH on v5e?

CLAUDE.md records the gather engine as row-rate-bound (~170M rows/s) at
512 B rows. If the row rate holds at 1-4 KB rows, packing 2x2 bilinear
corner blocks into one 4C-wide row would cut ROIAlign's gather time ~4x.
This probe measures rows/s for 256..2048-channel bf16 tables at a fixed
total byte volume. Tables are generated ON DEVICE (host->relay transfer of
GB-scale arrays takes minutes).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    total_rows_bytes = 512 * 3_000_000  # ~1.5 GB gathered per iteration

    for chans, dt in [
        (256, jnp.bfloat16),
        (512, jnp.bfloat16),
        (1024, jnp.bfloat16),
        (2048, jnp.bfloat16),
        (1024, jnp.int8),
    ]:
        row_bytes = chans * jnp.dtype(dt).itemsize
        n_rows = total_rows_bytes // row_bytes
        table_rows = 1_000_000 * 512 // row_bytes  # ~0.5 GB table

        @jax.jit
        def make(key):
            table = jax.random.normal(
                key, (table_rows, chans), jnp.float32
            ).astype(dt)
            idx = jax.random.randint(
                jax.random.fold_in(key, 1), (n_rows,), 0, table_rows, jnp.int32
            )
            return table, idx

        table, idx = make(jax.random.PRNGKey(0))

        @jax.jit
        def run(n, table, idx):
            def body(_, carry):
                ix, acc = carry
                g = jnp.take(table, ix, axis=0)
                s = jnp.sum(g.astype(jnp.float32))
                # data-dep: rotate indices by a value derived from the sum
                ix = jnp.roll(ix, (s.astype(jnp.int32) & 7) + 1)
                return ix, acc + s
            return jax.lax.fori_loop(0, n, body, (idx, jnp.float32(0)))[1]

        float(run(jnp.int32(1), table, idx))
        t0 = time.time(); float(run(jnp.int32(1), table, idx)); t1 = time.time() - t0
        iters = 8
        t0 = time.time(); float(run(jnp.int32(1 + iters), table, idx)); tm = time.time() - t0
        dt_s = max(tm - t1, 1e-9) / iters
        rate = n_rows / dt_s / 1e6
        gbs = n_rows * row_bytes / dt_s / 1e9
        print(
            f"{chans:5d}ch {str(np.dtype(dt)):9s} row={row_bytes:5d}B "
            f"rows={n_rows/1e6:5.2f}M  {dt_s*1e3:7.2f} ms  "
            f"{rate:7.1f} M rows/s  {gbs:6.1f} GB/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
