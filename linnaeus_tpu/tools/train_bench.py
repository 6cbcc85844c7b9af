"""Train-step wall-clock benchmark (real chip).

Measures the FULL jitted train step — on-device collate (mixing +
meta-masking), bf16 forward, fp32 loss, backward, global-norm clip, adamw
update — for the flagship mFormerV1_sm (reference hot loop:
train.py:115-380).

Methodology (see bench.py): the remote-TPU client reports buffers ready
before chained programs finish, so iterations run inside one jitted
``lax.fori_loop`` whose carry is the TrainState (XLA aliases the while-loop
carry, so params/opt-state update in place exactly like the donated
production step), ended by a single host scalar read; fixed dispatch/read
overhead cancels by differencing two iteration counts.

Usage:
    python -m linnaeus_tpu.tools.train_bench --batch 128 --img 224
    python -m linnaeus_tpu.tools.train_bench --sweep  # batch/dtype sweep
"""

from __future__ import annotations

import argparse
import json
import time


def _v0_sm_model(img: int, fp32_scores: bool):
    """mFormerV0_sm from the canonical arch registry (no copied geometry —
    round 1 benched a since-fixed wrong preset; deriving from
    MFORMER_V0_ARCHS keeps this pinned to the reference MetaFG_0 dims)."""
    import jax.numpy as jnp

    from linnaeus_tpu.configuration.archs import MFORMER_V0_ARCHS
    from linnaeus_tpu.models import MFormerV0

    spec = MFORMER_V0_ARCHS["mFormerV0_sm"]
    tasks = ("taxa_L10", "taxa_L20", "taxa_L30", "taxa_L40")
    return MFormerV0(
        img_size=(img, img),
        stage_dims=tuple(spec["DIMS"]),
        mbconv_depths=tuple(spec["MBCONV_DEPTHS"]),
        attn_depths=tuple(spec["ATTN_DEPTHS"]),
        num_heads=tuple(spec["NUM_HEADS"]),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=tasks,
        num_classes={"taxa_L10": 1000, "taxa_L20": 400,
                     "taxa_L30": 100, "taxa_L40": 30},
        head_configs={t: {"TYPE": "Linear"} for t in tasks},
        dtype=jnp.bfloat16,
        attn_fp32_softmax=fp32_scores,
    )


def build_step(batch: int, img: int, fp32_scores: bool, remat: bool,
               flash: bool = False, arch: str = "v1",
               rope_deinterleave: bool = True, v0_head_split: bool = False,
               moe: bool = False, size: str = "sm",
               fused_mlp: str = "auto", remat_policy: str = "full"):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_model
    from linnaeus_tpu.data.collate import MixConfig
    from linnaeus_tpu.loss import soft_target_cross_entropy
    from linnaeus_tpu.train.state import create_train_state
    from linnaeus_tpu.train.step import ScheduleScalars, make_train_step

    if arch == "v0":
        model = _v0_sm_model(img, fp32_scores)
        if v0_head_split:
            # A/B switch: weight-level head split in RelativeAttention
            # (measured neutral-to-slower there; default off)
            model = model.clone(head_split=True)
    else:
        model = _flagship_model(attn_fp32_softmax=fp32_scores)
        if size != "sm":
            # lg/xl geometry from configs/model/archs/mFormerV1_{lg,xl}.yaml
            geo = {
                "lg": dict(convnext_depths=(3, 3, 27, 3),
                           convnext_dims=(192, 384, 768, 1536),
                           rope_depths=(10, 2), rope_dims=(768, 1536),
                           rope_num_heads=(12, 24)),
                "xl": dict(convnext_depths=(3, 3, 27, 3),
                           convnext_dims=(256, 512, 1024, 2048),
                           rope_depths=(22, 2), rope_dims=(1024, 2048),
                           rope_num_heads=(16, 32)),
            }[size]
            model = model.clone(**geo)
        if img != 224 or remat or flash or not rope_deinterleave:
            model = model.clone(
                img_size=(img, img),
                gradient_checkpointing=remat,
                remat_policy=remat_policy,
                use_flash_attn=flash,
                rope_deinterleave=rope_deinterleave,
            )
        if fused_mlp != "auto":
            # A/B switch for the Pallas fused ConvNeXt MLP (ops/fused_mlp.py)
            model = model.clone(fused_convnext_mlp=(fused_mlp == "on"))
        if moe:
            # the mFormerV1_sm_moe preset: 8-expert top-2 MoE MLP on every
            # 2nd RoPE block (configs/model/archs/mFormerV1_sm_moe.yaml)
            model = model.clone(moe_num_experts=8, moe_top_k=2,
                                moe_every_n=2, moe_capacity_factor=1.25)
    tasks = model.task_keys
    nc = dict(model.num_classes)

    rng = jax.random.PRNGKey(0)
    images = jax.random.randint(rng, (batch, img, img, 3), 0, 256, jnp.uint8)
    aux = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 5), jnp.float32)
    targets = {
        t: jax.random.randint(jax.random.fold_in(rng, i + 2), (batch,), 0, nc[t])
        for i, t in enumerate(tasks)
    }
    group_ids = jnp.arange(batch, dtype=jnp.int32) // 2  # mixed-pairs layout
    batch_dict = {
        "images": images, "targets": targets, "aux": aux,
        "group_ids": group_ids,
    }

    variables = jax.jit(model.init)(
        rng, jnp.zeros((2, img, img, 3), jnp.bfloat16),
        jnp.zeros((2, 5), jnp.float32),
    )
    state = create_train_state(
        model, variables["params"], optax.adamw(1e-4), num_tasks=len(tasks),
        rng=rng, batch_stats=variables.get("batch_stats"),
    )
    criteria = {t: soft_target_cross_entropy for t in tasks}
    step = make_train_step(
        criteria, tasks,
        MixConfig(mixup_enabled=True, chunk_bounds=((0, 2), (2, 5))),
        clip_grad=5.0, has_meta=True, num_classes=nc,
        moe_aux_weight=0.01 if moe else 0.0,
        moe_z_weight=0.001 if moe else 0.0,
    )
    scalars = ScheduleScalars(
        mix_prob=jnp.float32(0.5),
        use_cutmix=jnp.asarray(False),
        meta_mask_prob=jnp.float32(0.3),
        partial_mask_prob=jnp.float32(0.0),
        partial_combo_mask=jnp.zeros(5, jnp.float32),
        null_mask_prob=jnp.float32(1.0),
    )

    def run(state, n):
        def body(i, st):
            new_st, _ = step(st, batch_dict, scalars)
            return new_st

        final = jax.lax.fori_loop(0, n, body, state)
        # the readout MUST depend on the updated params or XLA dead-code
        # eliminates the entire forward/backward/update (the global-norm
        # clip couples every grad into any single param leaf)
        leaf = jax.tree.leaves(final.params)[0]
        return leaf.astype(jnp.float32).sum() + jnp.float32(final.step)

    return jax.jit(run), state


def measure(batch: int = 128, img: int = 224, fp32_scores: bool = False,
            remat: bool = False, flash: bool = False,
            n1: int = 4, n2: int = 12, arch: str = "v1",
            rope_deinterleave: bool = True,
            v0_head_split: bool = False, moe: bool = False,
            size: str = "sm", fused_mlp: str = "auto",
            remat_policy: str = "full") -> dict:
    from linnaeus_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    run_j, state = build_step(batch, img, fp32_scores, remat, flash, arch,
                              rope_deinterleave=rope_deinterleave,
                              v0_head_split=v0_head_split, moe=moe, size=size,
                              fused_mlp=fused_mlp, remat_policy=remat_policy)

    def timed(n: int) -> float:
        t0 = time.perf_counter()
        import jax.numpy as jnp

        out = float(run_j(state, jnp.int32(n)))  # host read forces completion
        assert out == out, "NaN"
        return time.perf_counter() - t0

    compile_s = timed(1)  # compile + warm (compile dominates when cold)
    t1 = timed(n1)
    t2 = timed(n2)
    ms = 1000.0 * (t2 - t1) / (n2 - n1)
    return {
        "arch": arch, "size": size, "batch": batch, "img": img,
        "fp32_scores": fp32_scores, "remat": remat, "flash": flash,
        "moe": moe, "fused_mlp": fused_mlp, "remat_policy": remat_policy,
        "n1": n1, "n2": n2,
        "compile_s": round(compile_s, 1),
        "measure_s": round(t1 + t2, 1),
        "train_ms_per_step": round(ms, 2),
        "train_images_per_sec": round(batch / (ms / 1000.0), 1),
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser("train_bench")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--fp32-scores", action="store_true")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--remat-policy", default="full",
                   choices=("full", "dots", "dots_no_batch"),
                   help="remat policy under --remat (models/utils.py)")
    p.add_argument("--flash", action="store_true")
    p.add_argument("--no-deinterleave", action="store_true",
                   help="legacy interleaved-RoPE layout (A/B baseline)")
    p.add_argument("--v0-head-split", action="store_true",
                   help="v0 A/B: weight-level head split in "
                        "RelativeAttention (default off; measured neutral)")
    p.add_argument("--arch", choices=("v1", "v0"), default="v1",
                   help="v1 = mFormerV1_sm flagship; v0 = mFormerV0_sm")
    p.add_argument("--moe", action="store_true",
                   help="mFormerV1_sm_moe variant: 8-expert top-2 MoE MLP "
                        "on every 2nd RoPE block")
    p.add_argument("--size", choices=("sm", "lg", "xl"), default="sm",
                   help="mFormerV1 preset geometry (configs/model/archs)")
    p.add_argument("--fused-mlp", choices=("auto", "on", "off"),
                   default="auto",
                   help="Pallas fused ConvNeXt MLP A/B (auto = measured "
                        "geometry rule, ops/fused_mlp.py)")
    p.add_argument("--sweep", action="store_true",
                   help="batch {128,256,512} x scores {bf16,fp32}")
    args = p.parse_args(argv)

    if args.sweep:
        for batch in (128, 256, 512):
            for fp32 in (False, True):
                try:
                    print(json.dumps(measure(
                        batch=batch, img=args.img, fp32_scores=fp32,
                        remat=args.remat, flash=args.flash, arch=args.arch,
                    )))
                except Exception as e:  # OOM at large batches: report, move on
                    print(json.dumps({
                        "batch": batch, "fp32_scores": fp32,
                        "error": str(e)[:200],
                    }))
        return
    print(json.dumps(measure(
        batch=args.batch, img=args.img, fp32_scores=args.fp32_scores,
        remat=args.remat, flash=args.flash, arch=args.arch,
        rope_deinterleave=not args.no_deinterleave,
        v0_head_split=args.v0_head_split, moe=args.moe, size=args.size,
        fused_mlp=args.fused_mlp, remat_policy=args.remat_policy,
    )))


if __name__ == "__main__":
    main()
