"""Phase-2 abstention fine-tuning CLI.

Reference parity: linnaeus/rl_train_abstention.py:38-531 — load a phase-1
checkpoint, wrap the model in an actor-critic policy, build the abstention
environment over the training data, and run PPO.

Usage:
    python -m linnaeus_tpu.rl.train_abstention --cfg exp.yaml \
        --checkpoint /path/to/checkpoint_step_XXXX [--iterations 50]
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("train_abstention")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="phase-1 checkpoint dir (auto-resume dir if unset)")
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--rollout-steps", type=int, default=128)
    parser.add_argument("--mode", default="multitask",
                        choices=["multitask", "sequential"])
    parser.add_argument("--opts", nargs="*", default=None)
    args = parser.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.configuration import build_config
    from linnaeus_tpu.configuration.utils import setup_output_dirs
    from linnaeus_tpu.data.build import build_datasets, build_loaders
    from linnaeus_tpu.models.build import build_model
    from linnaeus_tpu.rl import (
        LinnaeusPolicyWrapper,
        PPOConfig,
        TaxonomicClassificationEnv,
        train_abstention_ppo,
    )
    from linnaeus_tpu.utils.logging import create_logger, get_main_logger
    from linnaeus_tpu.utils.meta import total_meta_dim

    config = build_config(args.cfg, opts=args.opts)
    config.freeze()
    setup_output_dirs(config)
    create_logger(config.ENV.OUTPUT.DIRS.LOGS)
    logger = get_main_logger()

    bundle = build_datasets(config)
    train_loader, _ = build_loaders(config, bundle)
    tree = bundle["taxonomy_tree"]

    model = build_model(config, bundle["num_classes"], tree)
    meta_dim = total_meta_dim(config)
    img = config.MODEL.IMG_SIZE
    hw = (img, img) if isinstance(img, int) else tuple(img)
    init_images = jnp.zeros((1, *hw, 3))
    init_aux = jnp.zeros((1, meta_dim)) if meta_dim else None

    policy = LinnaeusPolicyWrapper(
        backbone=model,
        task_keys=tuple(config.DATA.TASK_KEYS_H5),
        num_classes=bundle["num_classes"],
    )
    params = policy.init(jax.random.PRNGKey(0), init_images, init_aux)

    # warm-start the backbone from a phase-1 checkpoint
    ckpt_dir = args.checkpoint or config.ENV.OUTPUT.DIRS.CHECKPOINTS
    from linnaeus_tpu.utils import checkpoint as ckpt

    latest = ckpt_dir if ckpt_dir.rstrip("/").split("/")[-1].startswith(
        "checkpoint_step_"
    ) else ckpt.auto_resume_helper(ckpt_dir)
    if latest:
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(f"{latest}/{ckpt.STATE_DIR}")
        backbone_params = restored["params"]
        params = dict(params)
        params["params"] = dict(params["params"])
        params["params"]["backbone"] = backbone_params
        logger.info(f"Warm-started backbone from {latest}")
    else:
        logger.warning("No phase-1 checkpoint found; training policy from scratch")

    env = TaxonomicClassificationEnv(
        dataloader=train_loader,
        taxonomy_tree=tree,
        mode=args.mode,
        image_shape=(*hw, 3),
    )
    final_params, history = train_abstention_ppo(
        policy, params, env,
        cfg=PPOConfig(),
        num_iterations=args.iterations,
        steps_per_rollout=args.rollout_steps,
    )
    out = f"{config.ENV.OUTPUT.DIRS.CHECKPOINTS}/abstention_policy.msgpack"
    from flax.serialization import to_bytes

    with open(out, "wb") as f:
        f.write(to_bytes(jax.device_get(final_params)))
    logger.info(f"Saved abstention policy to {out}")
    train_loader.close()


if __name__ == "__main__":
    main()
