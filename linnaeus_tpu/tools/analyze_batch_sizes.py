"""Offline AutoBatch sweeps over memory fractions.

Reference parity: tools/analyze_batch_sizes.py (350 LoC) — for each target
memory fraction, report the max batch the compiled train/eval step fits.
"""

from __future__ import annotations

import argparse
import json


def sweep_memory_fractions(
    compile_step,
    fractions=(0.5, 0.6, 0.7, 0.8, 0.9),
    min_batch: int = 1,
    max_batch: int = 1024,
    hbm_bytes: int | None = None,
    multiple_of: int = 1,
) -> dict[float, int]:
    from linnaeus_tpu.train.autobatch import auto_find_batch_size

    return {
        f: auto_find_batch_size(
            compile_step, f, min_batch, max_batch,
            hbm_bytes=hbm_bytes, multiple_of=multiple_of,
        )
        for f in fractions
    }


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("analyze_batch_sizes")
    parser.add_argument("--arch", default="mFormerV1_sm")
    parser.add_argument("--img-size", type=int, default=224)
    parser.add_argument("--fractions", nargs="*", type=float,
                        default=[0.5, 0.7, 0.8, 0.9])
    parser.add_argument("--max-batch", type=int, default=1024)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.configuration.archs import apply_arch
    from linnaeus_tpu.models.build import build_model

    cfg = get_default_config()
    cfg.MODEL.IMG_SIZE = args.img_size
    cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = False
    apply_arch(cfg, args.arch)
    num_classes = {"taxa_L10": 1000, "taxa_L20": 400, "taxa_L30": 100,
                   "taxa_L40": 30}
    cfg.DATA.TASK_KEYS_H5 = list(num_classes)
    model = build_model(cfg, num_classes=num_classes)

    def forward(variables, images, aux):
        return model.apply(variables, images, aux, deterministic=True)

    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((2, args.img_size, args.img_size, 3)),
        jnp.zeros((2, 5)),
    )

    def compile_step(bs):
        images = jnp.zeros((bs, args.img_size, args.img_size, 3))
        aux = jnp.zeros((bs, 5))
        return jax.jit(forward).lower(variables, images, aux).compile()

    results = sweep_memory_fractions(
        compile_step, args.fractions, max_batch=args.max_batch
    )
    print(json.dumps({str(k): v for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
