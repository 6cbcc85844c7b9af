"""Model tests: mFormerV1 forward shapes, heads, hierarchical refinement."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linnaeus_tpu.configuration import get_default_config
from linnaeus_tpu.models import MFormerV1, build_model
from linnaeus_tpu.models.heads.heads import MultiTaskHeads
from linnaeus_tpu.utils.taxonomy import TaxonomyTree


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = MFormerV1(
        img_size=(64, 64),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(16, 32, 64, 128),
        rope_depths=(1, 1),
        rope_dims=(64, 128),
        rope_num_heads=(4, 4),
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=("taxa_L10", "taxa_L20"),
        num_classes={"taxa_L10": 7, "taxa_L20": 3},
        head_configs={"taxa_L10": {"TYPE": "Linear"}, "taxa_L20": {"TYPE": "Linear"}},
    )
    x = jnp.ones((2, 64, 64, 3))
    meta = jnp.ones((2, 5))
    params = model.init(jax.random.PRNGKey(0), x, meta)
    return model, params


def test_forward_shapes(tiny_model_and_params):
    model, params = tiny_model_and_params
    out = model.apply(params, jnp.ones((2, 64, 64, 3)), jnp.ones((2, 5)))
    assert out["taxa_L10"].shape == (2, 7)
    assert out["taxa_L20"].shape == (2, 3)


def test_forward_without_meta_equals_zero_meta(tiny_model_and_params):
    model, params = tiny_model_and_params
    x = jnp.ones((2, 64, 64, 3))
    out_none = model.apply(params, x, None)
    out_zero = model.apply(params, x, jnp.zeros((2, 5)))
    np.testing.assert_allclose(
        np.asarray(out_none["taxa_L10"]), np.asarray(out_zero["taxa_L10"]), rtol=1e-6
    )


def test_meta_masking_changes_output(tiny_model_and_params):
    model, params = tiny_model_and_params
    x = jnp.ones((2, 64, 64, 3))
    out_meta = model.apply(params, x, jnp.ones((2, 5)))
    out_zero = model.apply(params, x, jnp.zeros((2, 5)))
    assert not np.allclose(out_meta["taxa_L10"], out_zero["taxa_L10"])


def test_train_mode_dropout_rngs():
    model = MFormerV1(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        drop_path_rate=0.5,
        drop_rate=0.1,
        task_keys=("t1",),
        num_classes={"t1": 4},
        head_configs={"t1": {"TYPE": "Linear"}},
    )
    x = jnp.ones((4, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, None)
    out1 = model.apply(
        params, x, None, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    out2 = model.apply(
        params, x, None, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert not np.allclose(out1["t1"], out2["t1"])


@pytest.fixture(scope="module")
def hier_tree():
    return TaxonomyTree(
        {"taxa_L10": {0: 0, 1: 0, 2: 1, 3: 1}},
        task_keys=["taxa_L10", "taxa_L20"],
        num_classes={"taxa_L10": 4, "taxa_L20": 2},
    )


def test_hierarchical_softmax_head_refines(hier_tree):
    heads = MultiTaskHeads(
        task_keys=("taxa_L10", "taxa_L20"),
        num_classes={"taxa_L10": 4, "taxa_L20": 2},
        head_configs={
            "taxa_L10": {"TYPE": "HierarchicalSoftmax"},
            "taxa_L20": {"TYPE": "HierarchicalSoftmax"},
        },
        hierarchy_matrices=hier_tree.build_hierarchy_matrices(),
    )
    feats = jnp.ones((3, 16))
    params = heads.init(jax.random.PRNGKey(0), feats)
    refined = heads.apply(params, feats)
    plain = heads.apply(params, feats, gradnorm_mode=True)
    # coarse level is never refined
    np.testing.assert_allclose(refined["taxa_L20"], plain["taxa_L20"], rtol=1e-5)
    # fine level gets the log-prior added => differs from base logits
    assert not np.allclose(refined["taxa_L10"], plain["taxa_L10"])
    # refinement == base + log(parent_probs @ M + eps)
    parent_probs = jax.nn.softmax(np.asarray(plain["taxa_L20"], np.float32), axis=-1)
    m = hier_tree.build_hierarchy_matrices()["taxa_L20_taxa_L10"]
    expected = np.asarray(plain["taxa_L10"]) + np.log(parent_probs @ m + 1e-10)
    np.testing.assert_allclose(np.asarray(refined["taxa_L10"]), expected, rtol=1e-4)


def test_conditional_classifier_hard_routing(hier_tree):
    heads = MultiTaskHeads(
        task_keys=("taxa_L10", "taxa_L20"),
        num_classes={"taxa_L10": 4, "taxa_L20": 2},
        head_configs={
            "taxa_L10": {"TYPE": "ConditionalClassifier", "ROUTING_STRATEGY": "hard"},
            "taxa_L20": {"TYPE": "ConditionalClassifier"},
        },
        hierarchy_matrices=hier_tree.build_hierarchy_matrices(),
    )
    feats = jax.random.normal(jax.random.PRNGKey(3), (5, 16))
    params = heads.init(jax.random.PRNGKey(0), feats)
    out = heads.apply(params, feats, deterministic=True)
    assert out["taxa_L10"].shape == (5, 4)
    # hard routing: children of the non-argmax parent get ~log(eps) penalty
    parent_choice = np.argmax(np.asarray(out["taxa_L20"]), axis=-1)
    fine = np.asarray(out["taxa_L10"])
    for b in range(5):
        blocked = [2, 3] if parent_choice[b] == 0 else [0, 1]
        assert fine[b, blocked].max() < -10.0


def test_build_model_from_config():
    cfg = get_default_config()
    cfg.MODEL.TYPE = "mFormerV1"
    cfg.MODEL.IMG_SIZE = 64
    cfg.MODEL.CONVNEXT_STAGES.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.CONVNEXT_STAGES.DIMS = [16, 32, 64, 128]
    cfg.MODEL.ROPE_STAGES.DEPTHS = [1, 1]
    cfg.MODEL.ROPE_STAGES.DIMS = [64, 128]
    cfg.MODEL.ROPE_STAGES.NUM_HEADS = [4, 4]
    cfg.MODEL.ROPE_STAGES.MLP_RATIO = [4.0, 4.0]
    cfg.DATA.TASK_KEYS_H5 = ["taxa_L10", "taxa_L20"]
    cfg.TRAIN.MIXED_PRECISION.ENABLED = False
    cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = False
    model = build_model(cfg, num_classes={"taxa_L10": 5, "taxa_L20": 2})
    x = jnp.ones((1, 64, 64, 3))
    meta = jnp.ones((1, 5))  # temporal 2 + spatial 3 enabled by default
    params = model.init(jax.random.PRNGKey(0), x, meta)
    out = model.apply(params, x, meta)
    assert out["taxa_L10"].shape == (1, 5)
    assert out["taxa_L20"].shape == (1, 2)


def test_gradient_checkpointing_same_output():
    kwargs = dict(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        task_keys=("t1",),
        num_classes={"t1": 4},
        head_configs={"t1": {"TYPE": "Linear"}},
    )
    x = jnp.ones((2, 32, 32, 3))
    m1 = MFormerV1(gradient_checkpointing=False, **kwargs)
    m2 = MFormerV1(gradient_checkpointing=True, **kwargs)
    p = m1.init(jax.random.PRNGKey(0), x, None)
    o1 = m1.apply(p, x, None)
    o2 = m2.apply(p, x, None)
    np.testing.assert_allclose(
        np.asarray(o1["t1"]), np.asarray(o2["t1"]), rtol=1e-5, atol=1e-5
    )


def test_remat_policies_same_gradients():
    """TRAIN.GRADIENT_CHECKPOINTING.POLICY changes only the memory/
    recompute trade — gradients must match the no-remat model."""
    kwargs = dict(
        img_size=(32, 32),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=(8, 16, 32, 64),
        rope_depths=(1, 1),
        rope_dims=(32, 64),
        rope_num_heads=(2, 2),
        task_keys=("t1",),
        num_classes={"t1": 4},
        head_configs={"t1": {"TYPE": "Linear"}},
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    base = MFormerV1(gradient_checkpointing=False, **kwargs)
    p = base.init(jax.random.PRNGKey(0), x, None)

    def grads(model):
        def loss(params):
            out = model.apply(params, x, None)
            return jnp.sum(jnp.square(out["t1"].astype(jnp.float32)))

        return jax.grad(loss)(p)

    g0 = grads(base)
    for policy in ("full", "dots", "dots_no_batch"):
        m = MFormerV1(gradient_checkpointing=True, remat_policy=policy,
                      **kwargs)
        g = grads(m)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
                err_msg=policy,
            )
    with pytest.raises(ValueError, match="remat policy"):
        MFormerV1(gradient_checkpointing=True, remat_policy="bogus",
                  **kwargs).init(jax.random.PRNGKey(0), x, None)


def test_attn_fp32_softmax_knob():
    """ATTN_FP32_SOFTMAX=False (bf16-stored scores, serving knob) stays close
    to the fp32-score path, and is exactly identical under fp32 compute."""
    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.models.blocks.rope_mhsa import RoPE2DMHSABlock

    x32 = jax.random.normal(jax.random.PRNGKey(0), (2, 19, 32), jnp.float32)
    mk = lambda fp32sm, dt: RoPE2DMHSABlock(  # noqa: E731
        dim=32, img_grid_size=(4, 4), extra_token_num=3, num_heads=2,
        attn_fp32_softmax=fp32sm, dtype=dt,
    )
    # fp32 compute: both paths bitwise identical
    a_mod = mk(True, jnp.float32)
    params = a_mod.init(jax.random.PRNGKey(1), x32)["params"]
    a = a_mod.apply({"params": params}, x32)
    b = mk(False, jnp.float32).apply({"params": params}, x32)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0
    # bf16 compute: close (score quantization only)
    x16 = x32.astype(jnp.bfloat16)
    a16 = mk(True, jnp.bfloat16).apply({"params": params}, x16).astype(jnp.float32)
    b16 = mk(False, jnp.bfloat16).apply({"params": params}, x16).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(a16 - b16))) < 0.1


def test_rope_deinterleave_equivalence():
    """The weight-level de-interleave + head-split path (rope_deinterleave,
    the default) is mathematically equivalent to the interleaved nn.Dense
    path: scores are invariant under the shared q/k head-dim permutation and
    v/proj are untouched — same param tree, same outputs (up to matmul
    summation order). Covers mixed + axial RoPE and both fidelity modes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from linnaeus_tpu.models.blocks.rope_mhsa import RoPE2DAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 19, 48), jnp.float32)
    for mixed in (True, False):
        for fidelity in ("rotate", "reference_cos"):
            p0, outs = None, {}
            for deint in (False, True):
                m = RoPE2DAttention(
                    dim=48, img_grid_size=(4, 4), extra_token_num=3,
                    num_heads=4, rope_mixed=mixed, qkv_bias=True,
                    rope_fidelity=fidelity, rope_deinterleave=deint,
                )
                if p0 is None:
                    p0 = m.init(jax.random.PRNGKey(1), x)
                # identical param tree consumed by both paths
                outs[deint] = np.asarray(m.apply(p0, x))
            np.testing.assert_allclose(
                outs[True], outs[False], atol=1e-5,
                err_msg=f"mixed={mixed} fidelity={fidelity}",
            )


def test_rope_deinterleave_grad_equivalence():
    """Gradients through both layout paths agree — the de-interleave must
    not change training dynamics."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from linnaeus_tpu.models.blocks.rope_mhsa import RoPE2DMHSABlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 19, 48), jnp.float32)
    p0, grads = None, {}
    for deint in (False, True):
        m = RoPE2DMHSABlock(
            dim=48, img_grid_size=(4, 4), extra_token_num=3, num_heads=4,
            rope_deinterleave=deint,
        )
        if p0 is None:
            p0 = m.init(jax.random.PRNGKey(1), x)

        def loss(p):
            return jnp.sum(m.apply(p, x) ** 2)

        grads[deint] = jax.grad(loss)(p0)
    flat_a = jax.tree_util.tree_leaves(grads[True])
    flat_b = jax.tree_util.tree_leaves(grads[False])
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_relative_attention_head_split_equivalence():
    """mFormerV0's RelativeAttention with the weight-level head split
    (head_split, the default) matches the plain nn.Dense layout on the same
    param tree — outputs and grads (same rewrite as the RoPE path; no
    permutation involved since there are no RoPE pairs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from linnaeus_tpu.models.blocks.relative_mhsa import RelativeAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 19, 48), jnp.float32)
    for qkv_bias in (True, False):
        p0, outs, grads = None, {}, {}
        for split in (False, True):
            m = RelativeAttention(
                dim=48, img_size=(4, 4), extra_token_num=3, num_heads=4,
                qkv_bias=qkv_bias, head_split=split,
            )
            if p0 is None:
                p0 = m.init(jax.random.PRNGKey(1), x)
            outs[split] = np.asarray(m.apply(p0, x))

            def loss(p):
                return jnp.sum(m.apply(p, x) ** 2)

            grads[split] = jax.grad(loss)(p0)
        np.testing.assert_allclose(
            outs[True], outs[False], atol=1e-5, err_msg=f"qkv_bias={qkv_bias}"
        )
        for a, b in zip(jax.tree_util.tree_leaves(grads[True]),
                        jax.tree_util.tree_leaves(grads[False])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)
