"""Phase-2 abstention fine-tuning CLI.

Reference parity: linnaeus/rl_train_abstention.py:38-531 — load a phase-1
checkpoint, wrap the model in an actor-critic policy, build the abstention
environment over the training data, and run PPO.

``--eval-samples N`` measures greedy-policy abstention precision/recall on
N held-out (validation) samples BEFORE and AFTER PPO; ``--receipt out.json``
writes the reward curve + both evals — the proof the loop improves the
policy, not just that the GAE math is correct (VERDICT r4 Missing #2).

Usage:
    python -m linnaeus_tpu.rl.train_abstention --cfg exp.yaml \
        --checkpoint /path/to/checkpoint_step_XXXX [--iterations 50] \
        [--eval-samples 512 --receipt docs/receipts/rl_abstention.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def warm_start_actor_heads(policy_params: dict, backbone_params,
                           task_keys, logger=None) -> list[str]:
    """Copy each phase-1 Linear classification head into the matching actor
    head's class columns, keeping the abstain column/bias from init (the
    abstain-prior). The reference's phase-2 design adapts the TRAINED
    classifier into the actor (policies.py:13-402); a fresh actor must
    re-learn classification through the policy gradient — measured on-chip
    and on CPU, it converges to the all-abstain local optimum instead.

    Mutates ``policy_params['params']`` in place; returns the warmed task
    keys. Heads whose geometry doesn't match (non-Linear types) are left
    untouched."""
    import jax.numpy as jnp

    warmed: list[str] = []
    heads = backbone_params.get("head", {})
    for t in task_keys:
        hp = dict(heads.get(f"head_{t}", {})).get("Dense_0")
        ap = policy_params["params"].get(f"actor_{t}")
        if hp is None or ap is None:
            continue
        k, b = hp.get("kernel"), hp.get("bias")
        if k is None or b is None:  # e.g. USE_BIAS: False heads — skip
            continue
        ap = dict(ap)
        ak, ab = ap["kernel"], ap["bias"]
        if (
            getattr(k, "ndim", 0) == 2
            and k.shape[0] == ak.shape[0]
            and k.shape[1] == ak.shape[1] - 1
        ):
            ap["kernel"] = jnp.concatenate(
                [jnp.asarray(k, ak.dtype), ak[:, -1:]], axis=1
            )
            ap["bias"] = jnp.concatenate(
                [jnp.asarray(b, ab.dtype), ab[-1:]], axis=0
            )
            policy_params["params"][f"actor_{t}"] = ap
            warmed.append(t)
            if logger is not None:
                logger.info(
                    f"Actor head actor_{t} warm-started from the phase-1 "
                    f"classifier ({k.shape[1]} classes + abstain)"
                )
    return warmed


def evaluate_abstention(policy, params, loader, task_keys, num_classes,
                        max_samples: int, null_index: int = 0) -> dict:
    """Greedy (argmax) policy metrics on a held-out loader.

    Abstention is scored at the LEAF rank (task_keys[0], the finest level —
    the rank the reference's abstention reward centers on): treating
    "abstain" as the positive class against null-labeled ground truth gives
    precision/recall; accuracy-when-committing covers the non-null rows the
    policy chose to classify."""
    import jax
    import jax.numpy as jnp

    leaf = task_keys[0]

    @jax.jit
    def greedy(p, im, aux):
        logits, _ = policy.apply(p, im, aux, deterministic=True)
        return (
            {t: jnp.argmax(logits[t], axis=-1) for t in task_keys},
            # P(abstain) at the leaf: the continuous selectivity readout —
            # greedy argmax only flips once mass crosses the max class,
            # but PPO's learning shows first as p_abstain(null) pulling
            # away from p_abstain(known)
            jax.nn.softmax(logits[leaf], axis=-1)[:, -1],
        )

    stats = {
        t: dict(tp=0, fp=0, fn=0, committed_correct=0, committed_known=0,
                n_null=0)
        for t in task_keys
    }
    seen = 0
    p_abst_null: list[float] = []
    p_abst_known: list[float] = []
    from .provider import normalize_host_images

    for batch in loader:
        im = normalize_host_images(batch["images"])
        aux = batch.get("aux")
        aux = jnp.asarray(aux) if aux is not None else None
        acts_all, p_abst = jax.device_get(greedy(params, jnp.asarray(im), aux))
        leaf_tgt = np.asarray(batch["targets"][leaf])
        leaf_idx = leaf_tgt.argmax(-1) if leaf_tgt.ndim > 1 else leaf_tgt
        p_abst = np.asarray(p_abst)
        p_abst_null.extend(p_abst[leaf_idx == null_index].tolist())
        p_abst_known.extend(p_abst[leaf_idx != null_index].tolist())
        for t in task_keys:
            if t not in batch["targets"]:
                continue
            n_t = int(num_classes[t])
            tgt = np.asarray(batch["targets"][t])
            t_idx = tgt.argmax(-1) if tgt.ndim > 1 else tgt
            acts = np.asarray(acts_all[t])
            is_null = t_idx == null_index
            abstain = acts >= n_t  # the explicit abstain action
            s = stats[t]
            s["tp"] += int((abstain & is_null).sum())
            s["fp"] += int((abstain & ~is_null).sum())
            s["fn"] += int((~abstain & is_null).sum())
            commit_known = ~abstain & ~is_null
            s["committed_known"] += int(commit_known.sum())
            s["committed_correct"] += int(
                (acts[commit_known] == t_idx[commit_known]).sum()
            )
            s["n_null"] += int(is_null.sum())
        seen += im.shape[0]
        if seen >= max_samples:
            break

    def _summ(s):
        return {
            "abstain_rate": round((s["tp"] + s["fp"]) / max(seen, 1), 4),
            "abstain_precision": round(s["tp"] / max(s["tp"] + s["fp"], 1), 4),
            "abstain_recall": round(s["tp"] / max(s["tp"] + s["fn"], 1), 4),
            "acc_when_committing_on_known": round(
                s["committed_correct"] / max(s["committed_known"], 1), 4
            ),
        }

    out = {
        "samples": seen,
        "null_samples": stats[leaf]["n_null"],
        **_summ(stats[leaf]),  # leaf metrics at top level (stable keys)
        "mean_p_abstain_on_null": round(float(np.mean(p_abst_null)), 4)
        if p_abst_null else None,
        "mean_p_abstain_on_known": round(float(np.mean(p_abst_known)), 4)
        if p_abst_known else None,
        "per_rank": {t: _summ(stats[t]) for t in task_keys},
    }
    return out


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("train_abstention")
    parser.add_argument("--cfg", required=True)
    parser.add_argument("--checkpoint", default=None,
                        help="phase-1 checkpoint dir (auto-resume dir if unset)")
    parser.add_argument("--iterations", type=int, default=50)
    parser.add_argument("--rollout-steps", type=int, default=128)
    parser.add_argument("--mode", default="multitask",
                        choices=["multitask", "sequential"])
    parser.add_argument("--no-actor-warm-start", action="store_true",
                        help="keep fresh random actor heads instead of "
                             "copying the phase-1 classification heads")
    parser.add_argument("--lr", type=float, default=None,
                        help="PPO learning rate (default PPOConfig.lr; "
                             "fresh actor heads on a frozen-quality "
                             "backbone usually want 1e-4..3e-4)")
    parser.add_argument("--entropy-coef", type=float, default=None,
                        help="PPO entropy bonus (default PPOConfig)")
    parser.add_argument("--abstain-prior", type=float, default=0.0,
                        help="initial probability mass on the abstain "
                             "action (exploration prior; see "
                             "rl/policies.py)")
    parser.add_argument("--eval-samples", type=int, default=0,
                        help="held-out samples for before/after abstention "
                             "precision/recall (0 = skip)")
    parser.add_argument("--receipt", default="",
                        help="write reward curve + evals to this JSON")
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
    train_loader, val_loader = build_loaders(config, bundle)
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
        abstain_prior=float(args.abstain_prior),
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
        if not args.no_actor_warm_start:
            warm_start_actor_heads(
                params, backbone_params, config.DATA.TASK_KEYS_H5, logger
            )
    else:
        logger.warning("No phase-1 checkpoint found; training policy from scratch")

    env = TaxonomicClassificationEnv(
        dataloader=train_loader,
        taxonomy_tree=tree,
        mode=args.mode,
        image_shape=(*hw, 3),
    )
    task_keys = tuple(config.DATA.TASK_KEYS_H5)
    eval_before = eval_after = None
    if args.eval_samples > 0 and val_loader is not None:
        eval_before = evaluate_abstention(
            policy, params, val_loader, task_keys,
            bundle["num_classes"], args.eval_samples,
        )
        logger.info(f"abstention eval BEFORE PPO: {eval_before}")
    ppo_cfg = PPOConfig()
    if args.lr is not None:
        ppo_cfg = ppo_cfg._replace(lr=float(args.lr))
    if args.entropy_coef is not None:
        ppo_cfg = ppo_cfg._replace(entropy_coef=float(args.entropy_coef))
    final_params, history = train_abstention_ppo(
        policy, params, env,
        cfg=ppo_cfg,
        num_iterations=args.iterations,
        steps_per_rollout=args.rollout_steps,
    )
    if args.eval_samples > 0 and val_loader is not None:
        eval_after = evaluate_abstention(
            policy, final_params, val_loader, task_keys,
            bundle["num_classes"], args.eval_samples,
        )
        logger.info(f"abstention eval AFTER PPO: {eval_after}")
    out = f"{config.ENV.OUTPUT.DIRS.CHECKPOINTS}/abstention_policy.msgpack"
    from flax.serialization import to_bytes

    with open(out, "wb") as f:
        f.write(to_bytes(jax.device_get(final_params)))
    logger.info(f"Saved abstention policy to {out}")
    if args.receipt:
        import os

        receipt = {
            "device": str(jax.devices()[0].device_kind),
            "backend": jax.default_backend(),
            "mode": args.mode,
            "iterations": args.iterations,
            "steps_per_rollout": args.rollout_steps,
            "abstain_prior": args.abstain_prior,
            "warm_start": latest or None,
            "reward_curve": [
                [h["iteration"], round(h["mean_reward"], 4)] for h in history
            ],
            "reward_first": round(history[0]["mean_reward"], 4)
            if history else None,
            "reward_last": round(history[-1]["mean_reward"], 4)
            if history else None,
            "ppo_metrics_last": {
                k: round(v, 5) for k, v in history[-1].items()
                if k != "iteration"
            } if history else None,
            "eval_before": eval_before,
            "eval_after": eval_after,
        }
        os.makedirs(os.path.dirname(args.receipt) or ".", exist_ok=True)
        with open(args.receipt, "w") as f:
            json.dump(receipt, f, indent=1)
        logger.info(f"Wrote RL receipt to {args.receipt}")
    train_loader.close()


if __name__ == "__main__":
    main()
