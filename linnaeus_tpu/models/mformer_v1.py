"""mFormerV1 — modernized hybrid ConvNeXt + RoPE-2D transformer (Flax).

Behavioral spec from the reference (models/mFormerV1.py:31-541):

    4x4 conv stem -> ConvNeXt stage 1 -> downsample -> ConvNeXt stage 2
    -> downsample -> [CLS1 + meta tokens | patches] RoPE stage 3 -> LN
    -> strip extras, downsample -> [CLS2 + meta tokens | patches] RoPE stage 4
    -> LN -> dual-CLS Conv1d aggregation -> LN -> multitask heads

Metadata components (temporal/spatial/elevation) are embedded per stage by
Dense->ReLU->LN->ResNorm heads and prepended as extra tokens alongside the
CLS token. Drop-path rates decay linearly over the total depth (first two
ConvNeXt stages + both RoPE stages).

TPU-first design: NHWC conv layout end to end; token reshapes are pure
layout-free ``reshape``s; all matmuls run in the configured compute dtype
(bf16 by default) with fp32 heads/softmax; per-block ``nn.remat`` implements
gradient checkpointing (reference: TRAIN.GRADIENT_CHECKPOINTING).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from linnaeus_tpu.models.factory import register_model
from linnaeus_tpu.models.blocks.common import MetaHead, Mlp, trunc_normal_init
from linnaeus_tpu.models.blocks.convnext import (
    ConvNeXtBlock,
    ConvNeXtDownsampleLayer,
    ConvNeXtStem,
)
from linnaeus_tpu.models.blocks.rope_mhsa import RoPE2DMHSABlock
from linnaeus_tpu.models.heads.heads import MultiTaskHeads


@register_model("mFormerV1")
class MFormerV1(nn.Module):
    """See module docstring. All list-like fields are tuples (static)."""

    img_size: tuple[int, int] = (384, 384)
    in_chans: int = 3
    convnext_depths: tuple[int, ...] = (3, 3, 9, 3)
    convnext_dims: tuple[int, ...] = (96, 192, 384, 768)
    convnext_ls_init: float = 1e-6
    rope_depths: tuple[int, int] = (5, 2)
    rope_dims: tuple[int, int] = (384, 768)
    rope_num_heads: tuple[int, int] = (8, 8)
    rope_mlp_ratio: tuple[float, float] = (4.0, 4.0)
    rope_theta: float = 10000.0
    rope_mixed: bool = True
    # see RoPE2DAttention.rope_fidelity: 'rotate' (correct) or
    # 'reference_cos' (bit-compatible with reference-trained checkpoints)
    rope_fidelity: str = "rotate"
    # weight-level RoPE de-interleave + head split (see blocks/rope_mhsa.py
    # QKVProjectHeads) — mathematically equivalent; False keeps the plain
    # nn.Dense qkv path for layout A/B measurements
    rope_deinterleave: bool = True
    # sequence parallelism: set to a jax.sharding.Mesh to run attention as
    # a ppermute ring over ring_axis (ops/ring_attention.py) — the
    # beyond-one-chip path for 1024px+ token tensors
    ring_mesh: object = None
    ring_axis: str = "model"
    # pipeline parallelism (parallel/pipeline.py; Trainer wires this from
    # PARALLEL.PIPELINE): set to a jax.sharding.Mesh to run the RoPE towers
    # GPipe-pipelined over ``pipeline_axis`` — each device holds
    # depth/STAGES contiguous blocks (stage count = mesh axis size);
    # microbatched activations ppermute between stages. The per-block
    # parameter tree is UNCHANGED (stacking happens at call time), so
    # checkpoints interoperate with the sequential path bit-for-bit.
    # Requires uniform towers: no MoE, zero drop/attn-drop/drop-path.
    pipeline_mesh: object = None
    pipeline_axis: str = "model"
    pipeline_microbatches: int = 0  # 0 -> stage count
    # mesh axis the batch stays sharded over inside the pipeline (dp x pp);
    # None replicates the batch across the pipe axis
    pipeline_batch_axis: str | None = "data"
    # Mixture-of-Experts capacity scaling (blocks/moe.py — no reference
    # analog): num_experts > 0 replaces the dense MLP on every
    # ``moe_every_n``-th RoPE block (V-MoE placement) with a routed expert
    # bank whose weights shard over the 'model' mesh axis
    # (PARALLEL.PARAM_SHARDING='ep').
    moe_num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_every_n: int = 2
    moe_noise_std: float = 0.0
    # erf GELU for torch parity; tanh-approx is the fast TPU default
    act_exact: bool = False
    # Pallas fused ConvNeXt MLP (ops/fused_mlp.py): None = auto by measured
    # geometry (wins at batch<=64 with >=48x48 feature maps, i.e. the 384px
    # stage-1/2 shapes); True/False force. Same param tree either way.
    fused_convnext_mlp: bool | None = None
    use_flash_attn: bool = False
    # fp32-stored attention scores (reference parity); False halves the
    # softmax HBM traffic for serving (math stays f32 in-fusion)
    attn_fp32_softmax: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    only_last_cls: bool = False
    # dual-CLS aggregation selector (MODEL.AGGREGATION.TYPE; reference:
    # models/aggregation/utils.py:10). 'Conv1d'/'default' keeps the mFormer
    # 2->1 Conv1d path (and its checkpoint param names); other registry
    # entries (AdaptivePooling/Concatenation/Identity) plug in here.
    aggregation: str = "Conv1d"
    # ordered (name, dim) pairs of enabled metadata components
    meta_components: tuple[tuple[str, int], ...] = ()
    task_keys: tuple[str, ...] = ()
    num_classes: Mapping[str, int] | None = None
    head_configs: Mapping[str, Mapping[str, Any]] | None = None
    hierarchy_matrices: Mapping[str, np.ndarray] | None = None
    gradient_checkpointing: bool = False
    # rematerialization policy when gradient_checkpointing is on
    # (TRAIN.GRADIENT_CHECKPOINTING.POLICY): 'dots' (default) saves
    # every matmul output and recomputes only elementwise/LN work —
    # measured +10% over 'full' at sm/B=128 and 28x at xl, where
    # 'full' is pathological (2566 ms/step); 'full' saves nothing per
    # block (max memory savings); 'dots_no_batch' saves only
    # weight-shaped dot outputs. Math is identical either way.
    remat_policy: str = "dots"
    dtype: jnp.dtype = jnp.float32

    @property
    def extra_token_num(self) -> int:
        return 1 + len(self.meta_components)

    def setup(self):
        if self.rope_dims[0] != self.convnext_dims[2]:
            raise ValueError(
                f"ConvNeXt dim[2] ({self.convnext_dims[2]}) must match "
                f"RoPE dim[0] ({self.rope_dims[0]})"
            )
        if self.rope_dims[1] != self.convnext_dims[3]:
            raise ValueError(
                f"ConvNeXt dim[3] ({self.convnext_dims[3]}) must match "
                f"RoPE dim[1] ({self.rope_dims[1]})"
            )

        if self.pipeline_mesh is not None:
            S = int(self.pipeline_mesh.shape[self.pipeline_axis])
            if self.ring_mesh is not None:
                raise ValueError(
                    "pipeline_mesh and ring_mesh both claim the model mesh "
                    "axis (pp and sp are mutually exclusive)"
                )
            if self.moe_num_experts > 0:
                raise ValueError(
                    "pipeline parallelism requires uniform tower blocks — "
                    "MoE placement varies per block (disable MODEL.MOE or "
                    "PARALLEL.PIPELINE)"
                )
            if self.drop_rate or self.attn_drop_rate or self.drop_path_rate:
                raise ValueError(
                    "pipeline parallelism requires DROP_RATE, "
                    "ATTN_DROP_RATE and DROP_PATH_RATE all 0: stochastic "
                    "depth/dropout RNGs do not thread through the pipelined "
                    "scan (parallel/pipeline.py)"
                )
            if self.rope_depths[0] % S:
                raise ValueError(
                    f"pipeline parallelism: stage-3 depth "
                    f"{self.rope_depths[0]} is not divisible by the "
                    f"{S}-way '{self.pipeline_axis}' mesh axis"
                )

        conv_block = ConvNeXtBlock
        rope_block = RoPE2DMHSABlock
        if self.gradient_checkpointing:
            from linnaeus_tpu.models.utils import resolve_remat_policy

            kw = {}
            policy = resolve_remat_policy(self.remat_policy)
            if policy is not None:
                kw["policy"] = policy
            # static_argnums: (2) deterministic, (3) training — both route
            # Python-level branches inside the block
            conv_block = nn.remat(ConvNeXtBlock, static_argnums=(2, 3), **kw)
            rope_block = nn.remat(RoPE2DMHSABlock, static_argnums=(2,), **kw)

        total_depth = sum(self.convnext_depths[:2]) + sum(self.rope_depths)
        dpr = list(np.linspace(0.0, self.drop_path_rate, total_depth))
        dp = iter(dpr)

        self.stem = ConvNeXtStem(self.convnext_dims[0], dtype=self.dtype)
        self.stage1 = [
            conv_block(
                dim=self.convnext_dims[0],
                drop_path=float(next(dp)),
                layer_scale_init_value=self.convnext_ls_init,
                act_exact=self.act_exact,
                fused_mlp=self.fused_convnext_mlp,
                dtype=self.dtype,
                name=f"stage1_block{i}",
            )
            for i in range(self.convnext_depths[0])
        ]
        self.downsample1 = ConvNeXtDownsampleLayer(self.convnext_dims[1], dtype=self.dtype)
        self.stage2 = [
            conv_block(
                dim=self.convnext_dims[1],
                drop_path=float(next(dp)),
                layer_scale_init_value=self.convnext_ls_init,
                act_exact=self.act_exact,
                fused_mlp=self.fused_convnext_mlp,
                dtype=self.dtype,
                name=f"stage2_block{i}",
            )
            for i in range(self.convnext_depths[1])
        ]
        self.downsample2 = ConvNeXtDownsampleLayer(self.convnext_dims[2], dtype=self.dtype)
        self.downsample3 = ConvNeXtDownsampleLayer(self.convnext_dims[3], dtype=self.dtype)

        h3 = self.img_size[0] // 16
        w3 = self.img_size[1] // 16
        h4, w4 = h3 // 2, w3 // 2
        self._grid3, self._grid4 = (h3, w3), (h4, w4)

        def _moe_block(i: int) -> bool:
            # V-MoE placement: every moe_every_n-th block within each RoPE
            # stage gets the expert MLP (e.g. every_n=2 -> odd blocks).
            return (
                self.moe_num_experts > 0
                and i % max(self.moe_every_n, 1) == max(self.moe_every_n, 1) - 1
            )

        moe_kwargs = dict(
            moe_num_experts=max(self.moe_num_experts, 1),
            moe_top_k=self.moe_top_k,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_noise_std=self.moe_noise_std,
        )

        self.stage3 = [
            rope_block(
                dim=self.rope_dims[0],
                img_grid_size=(h3, w3),
                extra_token_num=self.extra_token_num,
                num_heads=self.rope_num_heads[0],
                mlp_ratio=self.rope_mlp_ratio[0],
                rope_theta=self.rope_theta,
                rope_mixed=self.rope_mixed,
                qkv_bias=True,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=float(next(dp)),
                use_flash_attn=self.use_flash_attn,
                rope_fidelity=self.rope_fidelity,
                rope_deinterleave=self.rope_deinterleave,
                ring_mesh=self.ring_mesh,
                ring_axis=self.ring_axis,
                act_exact=self.act_exact,
                attn_fp32_softmax=self.attn_fp32_softmax,
                use_moe=_moe_block(i),
                **moe_kwargs,
                dtype=self.dtype,
                name=f"stage3_block{i}",
            )
            for i in range(self.rope_depths[0])
        ]
        self.stage4 = [
            rope_block(
                dim=self.rope_dims[1],
                img_grid_size=(h4, w4),
                extra_token_num=self.extra_token_num,
                num_heads=self.rope_num_heads[1],
                mlp_ratio=self.rope_mlp_ratio[1],
                rope_theta=self.rope_theta,
                rope_mixed=self.rope_mixed,
                qkv_bias=True,
                drop=self.drop_rate,
                attn_drop=self.attn_drop_rate,
                drop_path=float(next(dp)),
                use_flash_attn=self.use_flash_attn,
                rope_fidelity=self.rope_fidelity,
                rope_deinterleave=self.rope_deinterleave,
                ring_mesh=self.ring_mesh,
                ring_axis=self.ring_axis,
                act_exact=self.act_exact,
                attn_fp32_softmax=self.attn_fp32_softmax,
                use_moe=_moe_block(i),
                **moe_kwargs,
                dtype=self.dtype,
                name=f"stage4_block{i}",
            )
            for i in range(self.rope_depths[1])
        ]

        self.norm_1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)
        self.norm_2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)

        self.cls_token_1 = self.param(
            "cls_token_1", trunc_normal_init, (1, 1, self.rope_dims[0])
        )
        self.cls_token_2 = self.param(
            "cls_token_2", trunc_normal_init, (1, 1, self.rope_dims[1])
        )

        self.meta_heads_1 = {
            name: MetaHead(self.rope_dims[0], dtype=self.dtype, name=f"meta_{name.lower()}_head_1")
            for name, dim in self.meta_components
            if dim > 0
        }
        self.meta_heads_2 = {
            name: MetaHead(self.rope_dims[1], dtype=self.dtype, name=f"meta_{name.lower()}_head_2")
            for name, dim in self.meta_components
            if dim > 0
        }

        if not self.only_last_cls:
            self.cl_1_fc = Mlp(
                hidden_features=self.rope_dims[0],
                out_features=self.rope_dims[1],
                drop=0.0,
                act_exact=self.act_exact,
                dtype=self.dtype,
                name="cl_1_fc",
            )
            self.cl_1_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="cl_1_norm")
            if self.aggregation in ("Conv1d", "default"):
                # dual-CLS aggregation: 2->1 channel 1x1 Conv1d over the feature axis
                self.aggregate = nn.Dense(
                    1, kernel_init=trunc_normal_init, dtype=self.dtype, name="aggregate"
                )
            else:
                from linnaeus_tpu.models.factory import AGGREGATION_REGISTRY

                cls = AGGREGATION_REGISTRY.get(self.aggregation)
                if cls is None:
                    raise ValueError(
                        f"Unknown MODEL.AGGREGATION.TYPE '{self.aggregation}'"
                    )
                kwargs = {"dtype": self.dtype, "name": "aggregate_alt"}
                if self.aggregation == "Concatenation":
                    kwargs["out_features"] = self.rope_dims[1]
                self.aggregate = cls(**kwargs)
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_norm")

        self.head = MultiTaskHeads(
            task_keys=tuple(self.task_keys),
            num_classes=self.num_classes or {},
            head_configs=self.head_configs or {},
            hierarchy_matrices=self.hierarchy_matrices,
            dtype=self.dtype,
            name="head",
        )

    def _rope_tower(
        self, stage: int, blocks, x: jnp.ndarray, deterministic: bool
    ) -> jnp.ndarray:
        """Run a RoPE tower sequentially, or GPipe-pipelined over the
        ``pipeline_axis`` mesh axis when ``pipeline_mesh`` is set (the
        Trainer wires PARALLEL.PIPELINE here). Init always takes the
        sequential path so the per-block parameter tree — and therefore the
        checkpoint format — is identical either way; at apply time the
        blocks' params are stacked on a leading layer axis and sharded one
        stage per device (parallel/pipeline.py)."""
        S = (
            int(self.pipeline_mesh.shape[self.pipeline_axis])
            if self.pipeline_mesh is not None
            else 0
        )
        if (
            not S
            or self.is_initializing()
            or len(blocks) % S  # stage 4 (depth 2) stays sequential on S>2
            or len(blocks) // S < 1
        ):
            for blk in blocks:
                x = blk(x, deterministic)
            return x
        from linnaeus_tpu.parallel.pipeline import (
            pipeline_forward,
            stack_layer_params,
        )

        stacked = stack_layer_params(
            [dict(blk.variables["params"]) for blk in blocks]
        )
        # The proto is block 0 DETACHED (parent=None): every configured
        # flag — and the nn.remat wrapper under gradient_checkpointing —
        # flows through automatically instead of being hand-mirrored (a
        # hand-copied arg list silently diverges when a block flag is
        # added; and dropping remat here would OOM exactly the
        # beyond-one-chip geometries pipelining exists for). Blocks are
        # uniform by the setup() gate, so block 0 IS the tower geometry.
        proto = blocks[0].clone(parent=None)

        def block_fn(p, h):
            return proto.apply({"params": p}, h, deterministic)

        return pipeline_forward(
            block_fn,
            stacked,
            x,
            self.pipeline_mesh,
            num_microbatches=int(self.pipeline_microbatches) or S,
            axis_name=self.pipeline_axis,
            batch_axis=self.pipeline_batch_axis,
        )

    def _meta_slices(self) -> list[tuple[str, int, int]]:
        out, offset = [], 0
        for name, dim in self.meta_components:
            out.append((name, offset, offset + dim))
            offset += dim
        return out

    def _extras(
        self, stage: int, cls_token, meta: jnp.ndarray | None, B: int
    ) -> jnp.ndarray:
        heads = self.meta_heads_1 if stage == 1 else self.meta_heads_2
        tokens = [jnp.broadcast_to(cls_token, (B,) + cls_token.shape[1:]).astype(self.dtype)]
        if meta is not None and self.meta_components:
            for name, start, end in self._meta_slices():
                if name in heads:
                    emb = heads[name](meta[:, start:end].astype(self.dtype))
                    tokens.append(emb[:, None, :])
        return jnp.concatenate(tokens, axis=1)

    def forward_features(
        self,
        x: jnp.ndarray,
        meta: jnp.ndarray | None = None,
        deterministic: bool = True,
        training: bool | None = None,
    ) -> jnp.ndarray:
        B = x.shape[0]
        if meta is None and self.meta_components:
            # None == fully masked metadata (all-zero aux vector); keeps the
            # token layout static, matching validation meta-masking semantics.
            total_dim = sum(d for _, d in self.meta_components)
            meta = jnp.zeros((B, total_dim), dtype=self.dtype)
        x = x.astype(self.dtype)
        x = self.stem(x)  # (B, H/4, W/4, D0)
        # training: explicit fused-MLP grad-gate routing (convnext.py) —
        # the train step passes True so a deterministic fine-tune under
        # jax.checkpoint cannot fall through to the serving channel
        for blk in self.stage1:
            x = blk(x, deterministic, training)
        x = self.downsample1(x)  # (B, H/8, W/8, D1)
        for blk in self.stage2:
            x = blk(x, deterministic, training)
        x = self.downsample2(x)  # (B, H/16, W/16, D2)

        h3, w3 = self._grid3
        x = x.reshape(B, h3 * w3, self.rope_dims[0])
        extras_1 = self._extras(1, self.cls_token_1, meta, B)
        x = jnp.concatenate([extras_1, x], axis=1)
        x = self._rope_tower(3, self.stage3, x, deterministic)
        x = self.norm_1(x)

        if not self.only_last_cls:
            cls_1 = x[:, 0:1, :]
            cls_1 = self.cl_1_norm(self.cl_1_fc(cls_1, deterministic))

        x = x[:, self.extra_token_num:, :]
        x = x.reshape(B, h3, w3, self.rope_dims[0])
        x = self.downsample3(x)  # (B, H/32, W/32, D3)
        h4, w4 = self._grid4
        x = x.reshape(B, h4 * w4, self.rope_dims[1])
        extras_2 = self._extras(2, self.cls_token_2, meta, B)
        x = jnp.concatenate([extras_2, x], axis=1)
        x = self._rope_tower(4, self.stage4, x, deterministic)
        x = self.norm_2(x)
        cls_2 = x[:, 0:1, :]

        if not self.only_last_cls:
            cat = jnp.concatenate([cls_1, cls_2], axis=1)  # (B, 2, D3)
            if self.aggregation in ("Conv1d", "default"):
                # 1x1 Conv1d with in_channels=2 -> out_channels=1 == Dense over
                # the token axis (B, D3, 2) @ (2, 1)
                agg = self.aggregate(jnp.transpose(cat, (0, 2, 1)))[..., 0]  # (B, D3)
            else:
                agg = self.aggregate(cat)  # registry module: (B, 2, D3) -> (B, D3)
            feats = self.final_norm(agg)
        else:
            feats = self.final_norm(cls_2[:, 0, :])
        return feats

    def __call__(
        self,
        x: jnp.ndarray,
        meta: jnp.ndarray | None = None,
        deterministic: bool = True,
        gradnorm_mode: bool = False,
        training: bool | None = None,
    ) -> dict[str, jnp.ndarray]:
        feats = self.forward_features(x, meta, deterministic, training)
        return self.head(feats, deterministic=deterministic, gradnorm_mode=gradnorm_mode)

    # ------------------------------------------------------------- metadata
    @property
    def parameter_groups_metadata(self) -> dict[str, Any]:
        """Semantic parameter groups for filters (mFormerV1.py:361-388)."""
        return {
            "stages": {
                "convnext_stages": ["stem", "stage1_", "stage2_", "downsample1", "downsample2"],
                "rope_stages": ["stage3_", "stage4_", "downsample3"],
                "rope_freqs": ["freqs"],
            },
            "heads": {
                "classification_heads": ["head"],
                "meta_heads": ["meta_"],
            },
            "embeddings": ["cls_token"],
            "norm_layers": ["norm", "LayerNorm"],
            "aggregation": ["cl_1_fc", "aggregate", "final_norm"],
        }

    @property
    def pretrained_ckpt_handling_metadata(self) -> dict[str, Any]:
        return {
            "drop_buffers": [],
            "drop_params": ["head", "meta_", "pos_embed", "norm.", "downsample"],
            "interpolate_rel_pos_bias": False,
            "supports_module_prefix": True,
            "strict": False,
        }
