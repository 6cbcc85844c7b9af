"""Batched on-device AutoAugment + the augmentation pipeline factory.

Reference parity: aug/base.py:15-220 (pipeline abstractions), aug/factory.py
(device dispatch), aug/cpu+gpu impls. Here the entire single-sample pipeline
— AutoAugment sub-policy selection, color jitter, random erasing, horizontal
flip — is one jittable function batched with vmap:

  * each sample draws a sub-policy index -> lax.switch over compiled branches
  * each op inside a branch applies with its table probability (lax.cond)
  * all randomness from a single per-batch PRNG key

The host-CPU path (AUG.SINGLE_AUG_DEVICE='cpu') reuses the same jnp ops on
CPU devices through the dataset's ``transform`` hook.
"""

from __future__ import annotations

from typing import Callable

import jax

from . import ops as A
from .policies import get_policy


def _make_subpolicy_fn(sub_policy) -> Callable:
    def apply(img, rng):
        for i, (op_name, prob, magnitude) in enumerate(sub_policy):
            op = A.OP_REGISTRY[op_name]
            r_gate, r_op = jax.random.split(jax.random.fold_in(rng, i))
            do = jax.random.bernoulli(r_gate, prob)
            img = jax.lax.cond(
                do,
                lambda im: op(im, float(magnitude), r_op),
                lambda im: im,
                img,
            )
        return img

    return apply


def make_autoaugment(policy_name: str = "original") -> Callable:
    """Returns ``fn(image [H,W,3] float32, rng) -> image`` applying one random
    sub-policy."""
    policy = get_policy(policy_name)
    branches = [_make_subpolicy_fn(sp) for sp in policy]

    def apply(img, rng):
        r_pick, r_ops = jax.random.split(rng)
        idx = jax.random.randint(r_pick, (), 0, len(branches))
        return jax.lax.switch(idx, branches, img, r_ops)

    return apply


def make_train_augment(
    policy_name: str = "original",
    color_jitter: float = 0.4,
    random_erase_prob: float = 0.25,
    random_erase_mode: str = "pixel",
    random_erase_area: tuple[float, float] = (0.02, 0.4),
    random_erase_aspect: tuple[float, float] = (0.3, 3.3),
    random_erase_count: int = 1,
    hflip_prob: float = 0.5,
) -> Callable:
    """Full single-image train pipeline (reference CPU pipeline order:
    autoaug -> color jitter -> flip -> erase), jittable + vmappable."""
    autoaug = make_autoaugment(policy_name) if policy_name else None

    def apply(img, rng):
        r_aa, r_cj, r_flip, r_re_gate, r_re = jax.random.split(rng, 5)
        if autoaug is not None:
            img = autoaug(img, r_aa)
        if color_jitter and color_jitter > 0:
            img = A.color_jitter(img, r_cj, color_jitter)
        if hflip_prob > 0:
            img = jax.lax.cond(
                jax.random.bernoulli(r_flip, hflip_prob),
                lambda im: im[:, ::-1, :],
                lambda im: im,
                img,
            )
        if random_erase_prob > 0:
            # AUG.RANDOM_ERASE.COUNT rectangles per gated image (static
            # unroll — count is a compile-time constant; reference timm
            # RandomErasing max_count semantics)
            def _erase(im):
                for i in range(max(int(random_erase_count), 1)):
                    im = A.random_erasing(
                        im, jax.random.fold_in(r_re, i), random_erase_area,
                        random_erase_aspect, random_erase_mode,
                    )
                return im

            img = jax.lax.cond(
                jax.random.bernoulli(r_re_gate, random_erase_prob),
                _erase,
                lambda im: im,
                img,
            )
        return img

    return apply


def make_batched_augment(single_fn: Callable) -> Callable:
    """vmap a single-image pipeline over the batch with split rngs."""

    @jax.jit
    def batched(images, rng):
        rngs = jax.random.split(rng, images.shape[0])
        return jax.vmap(single_fn)(images, rngs)

    return batched


class AugmentationPipelineFactory:
    """Config-driven construction (reference: aug/factory.py:14-44).

    Returns a batched ``fn(images [B,H,W,3] float32 in [0,1], rng) -> images``
    or None when every augmentation is disabled. The caller decides where it
    runs (reference AUG.SINGLE_AUG_DEVICE dispatch, aug/build.py:14):
    'device' fuses it into the jitted train step; 'cpu' applies it on the
    host JAX CPU backend inside the loader.
    """

    @staticmethod
    def create(config) -> Callable | None:
        aug = config.AUG
        policy = str(aug.AUTOAUG.POLICY or "")
        color_jitter = float(aug.AUTOAUG.COLOR_JITTER or 0.0)
        erase_prob = float(aug.RANDOM_ERASE.PROB or 0.0)
        if not policy and color_jitter <= 0 and erase_prob <= 0:
            return None
        from linnaeus_tpu.utils.debug import check_debug_flag
        from linnaeus_tpu.utils.logging import get_main_logger

        if check_debug_flag(config, "DEBUG.AUGMENTATION"):
            get_main_logger().debug(
                f"[AUGMENTATION] pipeline: policy={policy!r} "
                f"({len(get_policy(policy)) if policy else 0} sub-policies) "
                f"color_jitter={color_jitter} erase_prob={erase_prob} "
                f"erase_mode={aug.RANDOM_ERASE.MODE} "
                f"device={aug.SINGLE_AUG_DEVICE}"
            )
        single = make_train_augment(
            policy_name=policy if policy else "",
            color_jitter=color_jitter,
            random_erase_prob=erase_prob,
            random_erase_mode=str(aug.RANDOM_ERASE.MODE),
            random_erase_area=tuple(aug.RANDOM_ERASE.AREA_RANGE),
            random_erase_aspect=tuple(aug.RANDOM_ERASE.ASPECT_RATIO),
            random_erase_count=int(aug.RANDOM_ERASE.COUNT or 1),
        )
        return make_batched_augment(single)
