"""Attention dispatch: reference jnp path vs Pallas fused kernel.

The jnp path mirrors the reference's fp32 softmax attention
(rope_2d_mhsa.py:493-498); XLA fuses the scale/softmax chain and maps the two
batched matmuls onto the MXU. The Pallas path (ops/flash_attention.py) is an
online-softmax FlashAttention-2 kernel that never materializes the (N, N)
attention matrix in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax.nn


def sdpa_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    fp32_softmax: bool = True,
) -> jnp.ndarray:
    """Softmax attention on head-major (B, H, N, D) operands.

    Both einsums have (b, h) as leading batch dims matching the operand
    layout, so no internal operand/output transposes are needed — when q/k/v
    arrive head-major (weight-level head split in blocks/rope_mhsa.py) this
    is the churn-free formulation. ``fp32_softmax=False`` stores scores in
    the compute dtype (softmax max/exp/sum still f32 in-fusion) — see
    :func:`sdpa_bnhd`.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out_dtype = v.dtype
    if fp32_softmax:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q.astype(jnp.float32) * scale,
            k.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    else:
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk",
            q * jnp.asarray(scale, q.dtype),
            k,
            preferred_element_type=q.dtype,
        )
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            v.dtype
        )
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs,
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def sdpa_bnhd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    fp32_softmax: bool = True,
) -> jnp.ndarray:
    """Softmax attention on (B, N, H, D) operands.

    Same math as :func:`sdpa_reference` but contracts directly on the
    token-major layout produced by a qkv projection — the head axis is a
    dot_general batch dim, so XLA never materializes a (B, H, N, D)
    transpose of q/k/v or of the output (measured ~0.6 ms/block of copy
    fusions saved at B=128, N=199 on v5e).

    ``fp32_softmax=True`` (default) stores the (N, N) score matrix in fp32 —
    bit-parity with the reference's fp32 softmax (rope_2d_mhsa.py:493-498).
    ``False`` is a serving knob: scores/probs are STORED in the compute
    dtype while the softmax max/exp/sum still runs in fp32 registers inside
    the fusion — halves the dominant HBM traffic of non-flash attention.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    out_dtype = v.dtype
    if fp32_softmax:
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q.astype(jnp.float32) * scale,
            k.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    else:
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk",
            q * jnp.asarray(scale, q.dtype),
            k,
            preferred_element_type=q.dtype,
        )
        # elementwise f32 math fuses into the producer/consumer; only the
        # low-precision tensors ever hit HBM
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            v.dtype
        )
    out = jnp.einsum(
        "bhqk,bkhd->bqhd",
        probs,
        v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(out_dtype)


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    use_flash: bool = False,
    layout: str = "bhnd",
    fp32_softmax: bool = True,
) -> jnp.ndarray:
    """Dispatch between the reference path and the Pallas flash kernel.

    ``use_flash`` enables the kernel where it is PROFITABLE: measured on
    v5e, XLA's fused sdpa wins below ~512 tokens while the full-row-block
    Pallas kernels win above (docs/performance.md) — so short-sequence
    stages (e.g. mFormerV1 stage 4) keep the jnp path even when the config
    enables flash. The kernel also requires a TPU backend (Mosaic); other
    backends fall back silently, mirroring the reference's flash-attn
    availability fallback (rope_2d_mhsa.py:493-498).

    ``layout``: "bhnd" (head-major, reference convention) or "bnhd"
    (token-major, straight out of a qkv projection — avoids transposes).
    """
    n_axis = 2 if layout == "bhnd" else 1
    if use_flash:
        import jax

        from linnaeus_tpu.ops.flash_attention import KERNEL_BWD_MIN_SEQ

        if (
            jax.default_backend() == "tpu"
            and q.shape[n_axis] >= KERNEL_BWD_MIN_SEQ
        ):
            from linnaeus_tpu.ops.flash_attention import flash_attention

            if layout == "bnhd":
                q, k, v = (jnp.swapaxes(t, 1, 2) for t in (q, k, v))
                return jnp.swapaxes(
                    flash_attention(q, k, v, scale=scale), 1, 2
                )
            return flash_attention(q, k, v, scale=scale)
    if layout == "bnhd":
        return sdpa_bnhd(q, k, v, scale=scale, fp32_softmax=fp32_softmax)
    return sdpa_reference(q, k, v, scale=scale, fp32_softmax=fp32_softmax)
