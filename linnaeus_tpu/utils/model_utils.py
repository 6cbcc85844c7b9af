"""Model surgery helpers.

Reference parity: utils/model_utils.py:7 — relative-position-bias table
interpolation when changing image size (mFormerV0's RelativeAttention), plus
RoPE grid-change helpers (mFormerV1 needs none: mixed-RoPE angles are
recomputed from learnable frequencies for any grid).
"""

from __future__ import annotations

import numpy as np


def interpolate_rel_pos_bias(
    table: np.ndarray,
    src_grid: tuple[int, int],
    dst_grid: tuple[int, int],
) -> np.ndarray:
    """Bicubic-resize a relative-position-bias table between grid sizes.

    ``table``: ((2H-1)(2W-1) + 1, num_heads) — the final row (shared extra-
    token offset) is preserved untouched.
    """
    sh, sw = src_grid
    dh, dw = dst_grid
    if (sh, sw) == (dh, dw):
        return table
    num_heads = table.shape[1]
    src_rows = (2 * sh - 1) * (2 * sw - 1)
    if table.shape[0] != src_rows + 1:
        raise ValueError(
            f"table has {table.shape[0]} rows; expected {src_rows + 1} for grid "
            f"{src_grid}"
        )
    body = table[:-1].reshape(2 * sh - 1, 2 * sw - 1, num_heads)
    # bilinear resample on a normalized coordinate grid (numpy, init-time only)
    ys = np.linspace(0, 2 * sh - 2, 2 * dh - 1)
    xs = np.linspace(0, 2 * sw - 2, 2 * dw - 1)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.clip(y0 + 1, 0, 2 * sh - 2)
    x1 = np.clip(x0 + 1, 0, 2 * sw - 2)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    out = (
        body[y0][:, x0] * (1 - wy) * (1 - wx)
        + body[y0][:, x1] * (1 - wy) * wx
        + body[y1][:, x0] * wy * (1 - wx)
        + body[y1][:, x1] * wy * wx
    )
    out = out.reshape((2 * dh - 1) * (2 * dw - 1), num_heads)
    return np.concatenate([out, table[-1:]], axis=0).astype(table.dtype)
