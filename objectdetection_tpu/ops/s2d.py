"""Space-to-depth (2x2) weight/layout transforms for narrow-channel stages.

Stage 2 of the ResNet runs 64-channel convs at 256² — on v5e those pad to
128 lanes (half the MXU, double the effective traffic; measured 14-52 TF/s
vs 185 TF/s for the same math in a 4x-wider basis,
benchmarks/narrow_conv_probe.py). In the 2x2-blocked basis
``[B, H/2, W/2, 4*C]`` every stage-2 op has an exact equivalent:

- stride-1 1x1 conv  -> block-diagonal 1x1 conv over 4x channels,
- stride-1 3x3 conv  -> 3x3 conv over blocks with rearranged taps,
- BatchNorm/bias     -> per-channel params tiled 4x,
- stride-2 consumers -> the (0, 0) sub-pixel group is a channel slice.

Channel order is group-major: ``c_blocked = (dy * 2 + dx) * C + c``.
Parameters stay in their canonical shapes (checkpoint layout unchanged);
the transforms below run at apply time on the canonical weights (cheap —
a few hundred KB of slicing per conv).

≙ reference math exactly (fpn.py stage-2 blocks); pure layout change.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def space_to_depth(x: Array) -> Array:
    """[B, H, W, C] -> [B, H/2, W/2, 4C], group-major (dy, dx, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, H/2, W/2, dy, dx, C]
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x: Array) -> Array:
    """Inverse of :func:`space_to_depth`."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, H/2, dy, W/2, dx, C]
    return x.reshape(b, 2 * h2, 2 * w2, c)


def blocked_1x1_kernel(w: Array) -> Array:
    """[1, 1, Ci, Co] (or [Ci, Co]) -> [1, 1, 4Ci, 4Co] block-diagonal.

    A 1x1 conv acts per pixel, so in the blocked basis it applies the same
    [Ci, Co] map independently to each of the 4 sub-pixel groups.
    """
    if w.ndim == 4:
        w = w[0, 0]
    ci, co = w.shape
    out = jnp.zeros((4 * ci, 4 * co), w.dtype)
    for g in range(4):
        out = out.at[g * ci : (g + 1) * ci, g * co : (g + 1) * co].set(w)
    return out[None, None]


def blocked_3x3_kernel(w: Array) -> Array:
    """[3, 3, Ci, Co] stride-1 SAME conv -> [3, 3, 4Ci, 4Co] over blocks.

    Output sub-pixel (dy, dx) of block (i, j) is
        sum_{u,v in [-1,1]} w[u+1, v+1] * x[2i+dy+u, 2j+dx+v].
    Input pixel 2i+dy+u sits in block i + floor((dy+u)/2), sub-row
    (dy+u) mod 2 — so tap (u) maps to block-kernel position
    by = floor((dy+u)/2) + 1 and input group row dy' = (dy+u) mod 2.
    """
    kh, kw, ci, co = w.shape
    assert (kh, kw) == (3, 3)
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), w.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            go = dy * 2 + dx
            for u in (-1, 0, 1):
                for v in (-1, 0, 1):
                    a, bb = dy + u, dx + v
                    by, dy_in = a // 2 + 1, a % 2
                    bx, dx_in = bb // 2 + 1, bb % 2
                    gi = dy_in * 2 + dx_in
                    out = out.at[
                        by,
                        bx,
                        gi * ci : (gi + 1) * ci,
                        go * co : (go + 1) * co,
                    ].set(w[u + 1, v + 1])
    return out


def tile_channels(p: Array) -> Array:
    """Per-channel param [C] -> [4C] for the group-major blocked basis."""
    return jnp.tile(p, 4)
