"""2D-RoPE multi-head self-attention block (Flax).

Behavioral spec from the reference (models/blocks/rope_2d_mhsa.py:224-645):
image-grid tokens get 2D rotary embeddings (mixed/learnable per-head or fixed
axial frequencies); extra tokens (CLS + metadata) bypass rotation; attention
runs in fp32 (or via the fused Pallas kernel); block = preLN attn + preLN MLP
with drop-path.

TPU-first notes: rotation is real-valued cos/sin math fused by XLA into the
qkv projection epilogue; the grid size is static per stage so axial angles
are baked as compile-time constants; the flash path never materializes the
(N, N) matrix in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from linnaeus_tpu.ops import rope
from linnaeus_tpu.ops.attention import scaled_dot_product_attention
from .common import (
    DropPath,
    Mlp,
    ProjFromHeads,
    QKVProjectHeads,
    trunc_normal_init,
)


def _mixed_freqs_init(theta: float, head_dim: int, num_heads: int):
    """Init fn for the learnable mixed-RoPE frequencies (param 'freqs')."""

    def init(key, shape, dtype=jnp.float32):
        half = head_dim // 2
        freq_seq = jnp.arange(0, head_dim, 2, dtype=jnp.float32)[:half] / head_dim
        inv_freq = 1.0 / (theta**freq_seq)
        angles = jax.random.uniform(
            key, (num_heads, 1), minval=0.0, maxval=2 * jnp.pi
        )
        fx = inv_freq[None, :] * jnp.cos(angles)
        fy = inv_freq[None, :] * jnp.sin(angles)
        return jnp.stack([fx, fy], axis=0).astype(dtype)  # (2, H, half)

    return init


class RoPE2DAttention(nn.Module):
    dim: int
    img_grid_size: tuple[int, int]
    extra_token_num: int = 1
    num_heads: int = 8
    rope_theta: float = 10000.0
    rope_mixed: bool = True
    # 'rotate' = correct 2D RoPE. 'reference_cos' reproduces the reference
    # implementation's silent complex->real cast (rope_2d_mhsa.py:408
    # `freqs_cis.to(self.freqs.dtype)` discards the imaginary part), which
    # turns the rotation into per-position cos(theta) scaling. Use it when
    # migrating checkpoints trained with the reference.
    rope_fidelity: str = "rotate"
    # De-interleave the RoPE pair features at the qkv *weight* level (scores
    # are invariant to a shared q/k head-dim permutation; v is untouched) so
    # the rotation is contiguous-half math instead of a stride-2 pair walk.
    # Mathematically equivalent to the interleaved path up to matmul
    # summation order; saves the (…, half, 2)-shaped relayout copies.
    rope_deinterleave: bool = True
    # sequence parallelism: a jax.sharding.Mesh (static, hashable) routes
    # attention through ops/ring_attention.py with the token dim sharded
    # over ring_axis — the beyond-one-chip path for 1024px+ inputs. None =
    # single-chip attention (sdpa or flash).
    ring_mesh: object = None
    ring_axis: str = "model"
    qkv_bias: bool = True
    qk_scale: float | None = None
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    use_flash_attn: bool = False
    # fp32 score storage (reference parity); False = bf16-stored scores for
    # serving (softmax math stays f32 in-fusion, see ops/attention.py)
    attn_fp32_softmax: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, C = x.shape
        H_grid, W_grid = self.img_grid_size
        n_img = H_grid * W_grid
        n_extra = self.extra_token_num
        assert N == n_img + n_extra, f"seq len {N} != {n_img}+{n_extra}"
        head_dim = self.dim // self.num_heads
        scale = self.qk_scale or head_dim**-0.5

        if self.rope_deinterleave:
            q, k, v = QKVProjectHeads(
                dim=self.dim,
                num_heads=self.num_heads,
                perm=tuple(
                    rope.qkv_deinterleave_perm(self.dim, self.num_heads).tolist()
                ),
                use_bias=self.qkv_bias,
                dtype=self.dtype,
                name="qkv",
            )(x)
        else:
            qkv = nn.Dense(
                3 * self.dim,
                use_bias=self.qkv_bias,
                kernel_init=trunc_normal_init,
                dtype=self.dtype,
                name="qkv",
            )(x)
            # Token-major split: q/k/v stay (B, N, H, hd) — no (3, B, H, N,
            # hd) transpose ever materializes.
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(B, N, self.num_heads, head_dim)
            k = k.reshape(B, N, self.num_heads, head_dim)
            v = v.reshape(B, N, self.num_heads, head_dim)

        # RoPE angles for the image grid (extra tokens bypass rotation)
        if self.rope_mixed:
            freqs = self.param(
                "freqs",
                _mixed_freqs_init(self.rope_theta, head_dim, self.num_heads),
                (2, self.num_heads, head_dim // 2),
            )
            t_x, t_y = rope.init_t_xy(W_grid, H_grid)
            angles = rope.compute_mixed_angles(
                freqs, jnp.asarray(t_x), jnp.asarray(t_y)
            )
        else:
            angles = jnp.asarray(
                rope.compute_axial_angles(
                    head_dim, self.num_heads, (H_grid, W_grid), self.rope_theta
                )
            )
        cos, sin = rope.angles_to_cos_sin(angles)
        if self.rope_fidelity == "reference_cos":
            sin = jnp.zeros_like(sin)

        if self.rope_deinterleave:
            q, k = rope.apply_rotary_emb_deint(q, k, cos, sin, n_extra=n_extra)
        else:
            q, k = rope.apply_rotary_emb_bnhd(q, k, cos, sin, n_extra=n_extra)

        if self.ring_mesh is not None:
            # sequence parallelism: token dim sharded over the ring axis.
            # Transpose to head-major, pad N to a ring multiple (padded key
            # columns masked exactly via n_valid), run the ppermute ring,
            # slice + transpose back. For token tensors big enough to need
            # this, the two transposes are noise next to the N^2 attention.
            from linnaeus_tpu.ops.ring_attention import ring_attention

            p_size = self.ring_mesh.shape[self.ring_axis]
            n_pad = (-N) % p_size
            qh, kh, vh = (
                jnp.transpose(t, (0, 2, 1, 3)) for t in (q, k, v)
            )  # (B, H, N, D)
            if n_pad:
                pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
                qh, kh, vh = (jnp.pad(t, pad) for t in (qh, kh, vh))
            out = ring_attention(
                qh, kh, vh, self.ring_mesh, axis_name=self.ring_axis,
                scale=scale, n_valid=N,
            )[:, :, :N, :]
            out = jnp.transpose(out, (0, 2, 1, 3))  # (B, N, H, D)
        else:
            out = scaled_dot_product_attention(
                q, k, v, scale=scale, use_flash=self.use_flash_attn,
                layout="bnhd", fp32_softmax=self.attn_fp32_softmax,
            )
        # NOTE: attention-prob dropout is intentionally dropped on the flash
        # path (as in the reference flash branch); the jnp path applies it.
        if self.attn_drop > 0 and not self.use_flash_attn and not deterministic:
            # matches reference ordering loosely; applied to output since the
            # prob matrix is fused away. Kept for config parity.
            out = nn.Dropout(self.attn_drop)(out, deterministic=deterministic)

        if self.rope_deinterleave:
            out = ProjFromHeads(
                dim=self.dim, num_heads=self.num_heads, dtype=self.dtype,
                name="proj",
            )(out)
        else:
            out = out.reshape(B, N, C)
            out = nn.Dense(
                self.dim, kernel_init=trunc_normal_init, dtype=self.dtype,
                name="proj",
            )(out)
        out = nn.Dropout(self.proj_drop)(out, deterministic=deterministic)
        return out


class RoPE2DMHSABlock(nn.Module):
    """Pre-LN transformer block with 2D-RoPE attention."""

    dim: int
    img_grid_size: tuple[int, int]
    extra_token_num: int = 1
    num_heads: int = 8
    mlp_ratio: float = 4.0
    rope_theta: float = 10000.0
    rope_mixed: bool = True
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    use_flash_attn: bool = False
    rope_fidelity: str = "rotate"
    rope_deinterleave: bool = True
    ring_mesh: object = None
    ring_axis: str = "model"
    act_exact: bool = False
    attn_fp32_softmax: bool = True
    # Mixture-of-Experts MLP (blocks/moe.py): use_moe swaps the dense MLP
    # for an expert bank routed top-k per token. The param subtree lives
    # under the same "mlp" name (wi/wo/bi/bo + router instead of
    # Dense_0/Dense_1) so sharding rules key on the leaf names.
    use_moe: bool = False
    moe_num_experts: int = 8
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_noise_std: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn_out = RoPE2DAttention(
            dim=self.dim,
            img_grid_size=self.img_grid_size,
            extra_token_num=self.extra_token_num,
            num_heads=self.num_heads,
            rope_theta=self.rope_theta,
            rope_mixed=self.rope_mixed,
            qkv_bias=self.qkv_bias,
            attn_drop=self.attn_drop,
            proj_drop=self.drop,
            use_flash_attn=self.use_flash_attn,
            rope_fidelity=self.rope_fidelity,
            rope_deinterleave=self.rope_deinterleave,
            ring_mesh=self.ring_mesh,
            ring_axis=self.ring_axis,
            attn_fp32_softmax=self.attn_fp32_softmax,
            dtype=self.dtype,
            name="attn",
        )(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x), deterministic)
        x = x + DropPath(self.drop_path)(attn_out, deterministic=deterministic)

        if self.use_moe:
            from .moe import MoEMlp

            mlp = MoEMlp(
                dim=self.dim,
                hidden_features=int(self.dim * self.mlp_ratio),
                num_experts=self.moe_num_experts,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                noise_std=self.moe_noise_std,
                drop=self.drop,
                act_exact=self.act_exact,
                dtype=self.dtype,
                name="mlp",
            )
        else:
            mlp = Mlp(
                hidden_features=int(self.dim * self.mlp_ratio),
                out_features=self.dim,
                drop=self.drop,
                act_exact=self.act_exact,
                dtype=self.dtype,
                name="mlp",
            )
        mlp_out = mlp(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x), deterministic)
        x = x + DropPath(self.drop_path)(mlp_out, deterministic=deterministic)
        return x
