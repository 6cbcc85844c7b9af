"""mFormerV0 — MetaFormer reimplementation (Flax, NHWC).

Behavioral spec from the reference (models/mFormerV0.py:66-660):

    3-conv stem (+BN/ReLU/maxpool, /4) -> MBConv stage 1 -> MBConv stage 2
    (/8) -> RelativeAttention stage 3 (OverlapPatchEmbed /16, CLS1 + meta
    tokens) -> LN -> RelativeAttention stage 4 (/32, CLS2 + meta tokens)
    -> LN -> dual-CLS Conv1d aggregation -> LN -> multitask heads

Stage dims follow the reference convention: stem_out = dims[0], MBConv
stages output dims[1], dims[2]; attention stages use dims[3], dims[4]. The
first block of each attention stage strides 2 and re-embeds.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from linnaeus_tpu.models.factory import register_model
from linnaeus_tpu.models.blocks.common import MetaHead, Mlp, trunc_normal_init
from linnaeus_tpu.models.blocks.mbconv import MBConvBlock
from linnaeus_tpu.models.blocks.relative_mhsa import RelativeMHSABlock
from linnaeus_tpu.models.heads.heads import MultiTaskHeads


@register_model("mFormerV0")
class MFormerV0(nn.Module):
    img_size: tuple[int, int] = (384, 384)
    in_chans: int = 3
    # (stem, mbconv1, mbconv2, attn3, attn4) output dims
    stage_dims: tuple[int, ...] = (64, 96, 192, 384, 768)
    mbconv_depths: tuple[int, int] = (2, 3)
    attn_depths: tuple[int, int] = (5, 2)
    num_heads: tuple[int, int] = (6, 12)
    mlp_ratio: tuple[float, float] = (4.0, 4.0)
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    only_last_cls: bool = False
    meta_components: tuple[tuple[str, int], ...] = ()
    task_keys: tuple[str, ...] = ()
    num_classes: Mapping[str, int] | None = None
    head_configs: Mapping[str, Mapping[str, Any]] | None = None
    hierarchy_matrices: Mapping[str, np.ndarray] | None = None
    gradient_checkpointing: bool = False  # parity field; remat handled by XLA
    act_exact: bool = False  # erf GELU for torch parity
    use_flash_attn: bool = False  # relative attention has no flash variant
    # fp32-stored attention scores (reference parity); False = serving knob
    attn_fp32_softmax: bool = True
    # weight-level head split/merge in attention (blocks/common.py) —
    # mathematically equivalent, same param tree. Default OFF: measured
    # neutral-to-slightly-slower for RelativeAttention (negative result in
    # docs/performance.md), unlike the RoPE path where it wins ~4 ms/step.
    head_split: bool = False
    dtype: jnp.dtype = jnp.float32

    @property
    def extra_token_num(self) -> int:
        return 1 + len(self.meta_components)

    def _meta_slices(self):
        out, offset = [], 0
        for name, dim in self.meta_components:
            out.append((name, offset, offset + dim))
            offset += dim
        return out

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        meta: jnp.ndarray | None = None,
        deterministic: bool = True,
        gradnorm_mode: bool = False,
        training: bool | None = None,  # uniform BaseModel signature; V0 has
        # no fused-MLP routing so the flag is accepted but unused
    ) -> dict[str, jnp.ndarray]:
        B = x.shape[0]
        if meta is None and self.meta_components:
            total_dim = sum(d for _, d in self.meta_components)
            meta = jnp.zeros((B, total_dim), dtype=self.dtype)
        x = x.astype(self.dtype)
        dims = self.stage_dims
        bn = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=deterministic, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name,
        )

        # ---- stage 0: 3-conv stem, overall stride 4 (mFormerV0.py:175-203)
        stem0 = 3 * (dims[0] // 4)
        x = nn.Conv(stem0, (3, 3), strides=2, padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv0")(x)
        x = nn.relu(bn("stem_bn0")(x))
        x = nn.Conv(dims[0], (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv1")(x)
        x = nn.relu(bn("stem_bn1")(x))
        x = nn.Conv(dims[0], (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="stem_conv2")(x)
        x = nn.relu(bn("bn1")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # ---- stages 1-2: MBConv (stage1 stride 1; stage2 first block stride 2)
        for i in range(self.mbconv_depths[0]):
            x = MBConvBlock(
                input_filters=dims[0] if i == 0 else dims[1],
                output_filters=dims[1],
                expand_ratio=4,
                stride=1,
                drop_connect_rate=self.drop_rate,
                dtype=self.dtype,
                name=f"stage1_block{i}",
            )(x, deterministic)
        for i in range(self.mbconv_depths[1]):
            x = MBConvBlock(
                input_filters=dims[1] if i == 0 else dims[2],
                output_filters=dims[2],
                expand_ratio=4,
                stride=2 if i == 0 else 1,
                drop_connect_rate=self.drop_rate,
                dtype=self.dtype,
                name=f"stage2_block{i}",
            )(x, deterministic)

        H2, W2 = x.shape[1], x.shape[2]  # /8 grid

        # meta token embeddings per stage
        def extras(stage: int, dim: int):
            cls = self.param(
                f"cls_token_{stage}", trunc_normal_init, (1, 1, dim)
            )
            toks = [jnp.broadcast_to(cls, (B, 1, dim)).astype(self.dtype)]
            if meta is not None:
                for name, s, e in self._meta_slices():
                    toks.append(
                        MetaHead(dim, dtype=self.dtype,
                                 name=f"meta_{name.lower()}_head_{stage}")(
                            meta[:, s:e].astype(self.dtype)
                        )[:, None, :]
                    )
            return toks

        total_attn = sum(self.attn_depths)
        dp = lambda bi: self.drop_path_rate * bi / max(total_attn, 1)  # noqa: E731

        # ---- stage 3 (first block strides 2 => /16 grid)
        grid3 = (H2 // 2, W2 // 2)
        y = x
        for i in range(self.attn_depths[0]):
            y = RelativeMHSABlock(
                input_dim=dims[2] if i == 0 else dims[3],
                output_dim=dims[3],
                image_size=(H2, W2) if i == 0 else grid3,
                stride=2 if i == 0 else 1,
                num_heads=self.num_heads[0],
                mlp_ratio=self.mlp_ratio[0],
                drop_path=dp(i),
                extra_token_num=self.extra_token_num,
                qkv_bias=True,
                attn_drop=self.attn_drop_rate,
                proj_drop=self.drop_rate,
                act_exact=self.act_exact,
                attn_fp32_softmax=self.attn_fp32_softmax,
                head_split=self.head_split,
                dtype=self.dtype,
                name=f"stage3_block{i}",
            )(y, extras(1, dims[3]) if i == 0 else None, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_1")(y)

        if not self.only_last_cls:
            cls_1 = y[:, 0:1, :]
            cls_1 = Mlp(
                hidden_features=dims[3], out_features=dims[4],
                drop=0.0, act_exact=self.act_exact, dtype=self.dtype,
                name="cl_1_fc",
            )(cls_1, deterministic)
            cls_1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="cl_1_norm")(cls_1)

        # ---- stage 4 (/32 grid)
        patches = y[:, self.extra_token_num:, :]
        x4 = patches.reshape(B, grid3[0], grid3[1], dims[3])
        grid4 = (grid3[0] // 2, grid3[1] // 2)
        y = x4
        for i in range(self.attn_depths[1]):
            y = RelativeMHSABlock(
                input_dim=dims[3] if i == 0 else dims[4],
                output_dim=dims[4],
                image_size=grid3 if i == 0 else grid4,
                stride=2 if i == 0 else 1,
                num_heads=self.num_heads[1],
                mlp_ratio=self.mlp_ratio[1],
                drop_path=dp(self.attn_depths[0] + i),
                extra_token_num=self.extra_token_num,
                qkv_bias=True,
                attn_drop=self.attn_drop_rate,
                proj_drop=self.drop_rate,
                act_exact=self.act_exact,
                attn_fp32_softmax=self.attn_fp32_softmax,
                head_split=self.head_split,
                dtype=self.dtype,
                name=f"stage4_block{i}",
            )(y, extras(2, dims[4]) if i == 0 else None, deterministic)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_2")(y)
        cls_2 = y[:, 0:1, :]

        if not self.only_last_cls:
            cat = jnp.concatenate([cls_1, cls_2], axis=1)  # (B, 2, D4)
            agg = nn.Dense(1, kernel_init=trunc_normal_init, dtype=self.dtype,
                           name="aggregate")(jnp.transpose(cat, (0, 2, 1)))[..., 0]
            feats = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(agg)
        else:
            feats = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")(cls_2[:, 0, :])

        heads = MultiTaskHeads(
            task_keys=tuple(self.task_keys),
            num_classes=self.num_classes or {},
            head_configs=self.head_configs or {},
            hierarchy_matrices=self.hierarchy_matrices,
            dtype=self.dtype,
            name="head",
        )
        return heads(feats, deterministic=deterministic, gradnorm_mode=gradnorm_mode)

    @property
    def parameter_groups_metadata(self) -> dict[str, Any]:
        return {
            "stages": {
                "conv_stages": ["stem_", "bn1", "stage1_", "stage2_"],
                "attn_stages": ["stage3_", "stage4_"],
            },
            "heads": {
                "classification_heads": ["head"],
                "meta_heads": ["meta_"],
            },
            "embeddings": ["cls_token"],
            "norm_layers": ["norm", "bn"],
            "aggregation": ["cl_1_fc", "aggregate", "final_norm"],
        }

    @property
    def pretrained_ckpt_handling_metadata(self) -> dict[str, Any]:
        return {
            "drop_buffers": ["relative_position_index"],
            "drop_params": ["head", "meta_"],
            "interpolate_rel_pos_bias": True,
            "supports_module_prefix": True,
            "strict": False,
        }
