"""2D Rotary Position Embedding math (pure jnp, real-valued).

Behavioral spec from the reference (models/blocks/rope_2d_mhsa.py:57-218):
mixed mode uses learnable per-head 2D frequencies initialized by projecting
the 1D inverse-frequency ladder onto random planar directions; axial mode
uses fixed per-axis frequency ladders (first half of the pair-dim rotates by
x-angle, second half by y-angle). Rotation operates on (even, odd) feature
pairs as complex multiplication — implemented here with real cos/sin ops,
which XLA fuses into the surrounding elementwise graph (complex dtypes are
avoided; the VPU has no native complex support).

All angle math runs in float32 regardless of compute dtype (parity with the
reference's fp32 "polar fix") and the rotated q/k are cast back to the input
dtype.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def init_t_xy(end_x: int, end_y: int) -> tuple[np.ndarray, np.ndarray]:
    """Flattened (x, y) coordinates of an ``end_y``×``end_x`` grid, row-major."""
    t = np.arange(end_x * end_y, dtype=np.float32)
    t_x = t % end_x
    t_y = np.floor(t / end_x)
    return t_x, t_y


def init_random_2d_freqs(
    head_dim: int,
    num_heads: int,
    theta: float = 10000.0,
    rotate: bool = True,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """Learnable mixed-frequency init, shape (2, num_heads, head_dim//2).

    The inverse-frequency ladder 1/theta^(2k/D) is projected onto a random
    planar direction per head (reference: rope_2d_mhsa.py:76-112).
    """
    if rng is None:
        rng = np.random.default_rng(0)
    half = head_dim // 2
    freq_seq = np.arange(0, head_dim, 2, dtype=np.float32)[:half] / head_dim
    inv_freq = 1.0 / (theta**freq_seq)  # (half,)
    fx, fy = [], []
    for _ in range(num_heads):
        angle = rng.uniform(0, 2 * np.pi) if rotate else 0.0
        fx.append(inv_freq * np.cos(angle))
        fy.append(inv_freq * np.sin(angle))
    freqs = np.stack([np.stack(fx), np.stack(fy)], axis=0)  # (2, H, half)
    return freqs.astype(np.float32)


def compute_mixed_angles(
    freqs: jnp.ndarray, t_x: jnp.ndarray, t_y: jnp.ndarray
) -> jnp.ndarray:
    """Rotation angles for mixed (learnable) mode.

    Args:
        freqs: (2, num_heads, head_dim//2) learnable frequencies.
        t_x, t_y: (N_img,) patch coordinates.
    Returns:
        (N_img, num_heads, head_dim//2) float32 angles.
    """
    freqs = freqs.astype(jnp.float32)
    t_x = t_x.astype(jnp.float32)
    t_y = t_y.astype(jnp.float32)
    ax = jnp.einsum("n,hd->nhd", t_x, freqs[0])
    ay = jnp.einsum("n,hd->nhd", t_y, freqs[1])
    return ax + ay


def compute_axial_angles(
    head_dim: int,
    num_heads: int,
    grid_hw: tuple[int, int],
    theta: float = 10000.0,
) -> np.ndarray:
    """Fixed axial angles, shape (N_img, num_heads, head_dim//2).

    First ``head_dim//4`` pair-dims rotate with x-coordinates, the next with
    y-coordinates; any remainder is left unrotated (angle 0) — reference
    parity: rope_2d_mhsa.py:324-393.
    """
    H, W = grid_hw
    half = head_dim // 2
    freq_dim = max(half // 2, 1)
    base = 1.0 / (
        theta ** (np.arange(0, half, 2, dtype=np.float32)[:freq_dim] / half)
    )
    t_x, t_y = init_t_xy(W, H)
    ang_x = np.einsum("n,d->nd", t_x, base)  # (N, freq_dim)
    ang_y = np.einsum("n,d->nd", t_y, base)
    angles = np.concatenate([ang_x, ang_y], axis=-1)  # (N, 2*freq_dim)
    if angles.shape[-1] < half:
        pad = np.zeros((angles.shape[0], half - angles.shape[-1]), dtype=np.float32)
        angles = np.concatenate([angles, pad], axis=-1)
    elif angles.shape[-1] > half:
        angles = angles[:, :half]
    # identical across heads
    return np.broadcast_to(angles[:, None, :], (angles.shape[0], num_heads, half)).astype(
        np.float32
    )


def apply_rotary_emb(
    query: jnp.ndarray,
    key: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotate image-token q/k by per-position angles.

    Args:
        query, key: (B, num_heads, N_img, head_dim).
        cos, sin: (N_img, num_heads, head_dim//2) — cos/sin of the angles.
    Returns:
        Rotated (q, k), same shape/dtype as inputs.
    """
    in_dtype = query.dtype
    B, H, N, D = query.shape
    half = D // 2
    # (N, H, half) -> (1, H, N, half) for broadcasting
    cos_b = jnp.transpose(cos, (1, 0, 2))[None].astype(jnp.float32)
    sin_b = jnp.transpose(sin, (1, 0, 2))[None].astype(jnp.float32)

    def rot(x):
        x = x.astype(jnp.float32).reshape(B, H, N, half, 2)
        xe, xo = x[..., 0], x[..., 1]
        re = xe * cos_b - xo * sin_b
        im = xe * sin_b + xo * cos_b
        return jnp.stack([re, im], axis=-1).reshape(B, H, N, D)

    return rot(query).astype(in_dtype), rot(key).astype(in_dtype)


def angles_to_cos_sin(angles: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    angles = angles.astype(jnp.float32)
    return jnp.cos(angles), jnp.sin(angles)


def deinterleave_perm(head_dim: int) -> np.ndarray:
    """Static permutation mapping interleaved pair features (e0,o0,e1,o1,…)
    to contiguous halves [e0,e1,… | o0,o1,…] within one head."""
    half = head_dim // 2
    p = np.empty(head_dim, np.int64)
    p[:half] = np.arange(0, head_dim, 2)
    p[half:] = np.arange(1, head_dim, 2)
    return p


def qkv_deinterleave_perm(dim: int, num_heads: int) -> np.ndarray:
    """Column permutation for a (C, 3C) fused-qkv kernel that de-interleaves
    the RoPE pair features of q and k per head; v columns stay put.

    Attention scores q·kᵀ are invariant under any fixed permutation of the
    head dim applied to BOTH q and k, and v is untouched, so permuting the
    projection *weights* (a static gather on a tiny (C,3C) matrix, ~µs)
    makes the rotation pure contiguous-half math on the activations — no
    trailing-2 reshape/stack, no strided lane slices (measured 0.8 ms/step
    of (…,half,2)-shaped relayout copies at B=128 on v5e; see
    docs/performance.md layout-churn table).
    """
    head_dim = dim // num_heads
    hp = deinterleave_perm(head_dim)
    per_head = np.concatenate(
        [hp + h * head_dim for h in range(num_heads)]
    )
    return np.concatenate(
        [per_head, per_head + dim, np.arange(dim, dtype=np.int64) + 2 * dim]
    )


def apply_rotary_emb_deint(
    query: jnp.ndarray,
    key: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    n_extra: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rotation on de-interleaved q/k: first D/2 features are the even
    (real) pair members, second D/2 the odd (imaginary) ones.

    Equivalent to :func:`apply_rotary_emb_bnhd` composed with the per-head
    permutation from :func:`deinterleave_perm` — both contiguous-half slices
    map onto full vector lanes instead of a stride-2 walk. Token-major
    (B, N, H, D) operands only — the head-major variant was measured slower
    end-to-end and removed (docs/performance.md, head-major emission
    negative result).
    """
    dtype = query.dtype
    half = cos.shape[-1]
    if n_extra:
        pad_c = jnp.ones((n_extra,) + cos.shape[1:], cos.dtype)
        pad_s = jnp.zeros((n_extra,) + sin.shape[1:], sin.dtype)
        cos = jnp.concatenate([pad_c, cos], axis=0)
        sin = jnp.concatenate([pad_s, sin], axis=0)
    cos_b = cos[None].astype(dtype)  # (1, N, H, half)
    sin_b = sin[None].astype(dtype)

    def rot(x):
        xe = x[..., :half]
        xo = x[..., half:]
        return jnp.concatenate(
            [xe * cos_b - xo * sin_b, xe * sin_b + xo * cos_b], axis=-1
        )

    return rot(query), rot(key)


def apply_rotary_emb_bnhd(
    query: jnp.ndarray,
    key: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    n_extra: int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Token-major rotation with extra-token pass-through.

    Same math as :func:`apply_rotary_emb` (reference rope_2d_mhsa.py:118-135)
    but TPU-shaped: operands stay in the (B, N, H, D) layout a qkv projection
    emits (no head-major transpose), the leading ``n_extra`` tokens are
    handled by prepending identity rows (cos=1, sin=0 — bitwise pass-through)
    instead of slice+concat, and the rotation runs in the input dtype so no
    (B, N, H, D)-sized fp32 temporary hits HBM.

    Args:
        query, key: (B, N, H, D) with N = n_extra + N_img.
        cos, sin: (N_img, H, half) angle tables.
    """
    dtype = query.dtype
    half = cos.shape[-1]
    if n_extra:
        pad_c = jnp.ones((n_extra,) + cos.shape[1:], cos.dtype)
        pad_s = jnp.zeros((n_extra,) + sin.shape[1:], sin.dtype)
        cos = jnp.concatenate([pad_c, cos], axis=0)
        sin = jnp.concatenate([pad_s, sin], axis=0)
    cos_b = cos[None].astype(dtype)  # (1, N, H, half)
    sin_b = sin[None].astype(dtype)

    def rot(x):
        b, n, h, d = x.shape
        xr = x.reshape(b, n, h, half, 2)
        xe, xo = xr[..., 0], xr[..., 1]
        re = xe * cos_b - xo * sin_b
        im = xe * sin_b + xo * cos_b
        return jnp.stack([re, im], axis=-1).reshape(b, n, h, d)

    return rot(query), rot(key)
