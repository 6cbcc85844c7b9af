"""Shape + gradient tests for the registered attention zoo, aggregations,
and feature resolvers (VERDICT #8: previously registered but unexercised).

Reference parity: models/attention/*.py (7 modules), models/aggregation/*.py
(4), models/resolvers/*.py (4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import linnaeus_tpu.models  # noqa: F401  (populate registries)
from linnaeus_tpu.models.factory import (
    AGGREGATION_REGISTRY,
    ATTENTION_REGISTRY,
    RESOLVER_REGISTRY,
)

B, H, W, C = 2, 8, 8, 16
N = H * W


def _grad_flows(module, *args, **kwargs):
    """init + forward + grad of sum(output) wrt params; asserts finiteness
    and at least one nonzero gradient leaf (param-less modules: grad wrt the
    input instead)."""
    variables = module.init(jax.random.PRNGKey(0), *args, **kwargs)
    params = variables.get("params", {})

    if jax.tree.leaves(params):
        def loss(p):
            out = module.apply({"params": p}, *args, **kwargs)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grads = jax.grad(loss)(params)
    else:
        def loss(x0):
            out = module.apply(variables, x0, *args[1:], **kwargs)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        grads = jax.grad(loss)(args[0])
    leaves = jax.tree.leaves(grads)
    assert leaves
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
    return module.apply({"params": params}, *args, **kwargs)


@pytest.fixture(scope="module")
def grid():
    return jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))


@pytest.fixture(scope="module")
def tokens():
    return jax.random.normal(jax.random.PRNGKey(2), (B, N, C))


def test_registry_counts():
    assert {
        "CBAM", "ECA", "Linformer", "EfficientSelfAttention",
        "DifferentialAttention", "TaskSpecificAttention",
        "HierarchicalAttention",
    } <= set(ATTENTION_REGISTRY)
    assert {"AdaptivePooling", "Concatenation", "Conv1d", "Identity"} <= set(
        AGGREGATION_REGISTRY
    )
    assert {
        "LearnedProjection", "AdaptivePooling", "Concatenation", "Identity"
    } <= set(RESOLVER_REGISTRY)


def test_cbam(grid):
    out = _grad_flows(ATTENTION_REGISTRY["CBAM"](), grid)
    assert out.shape == grid.shape


def test_eca(grid):
    out = _grad_flows(ATTENTION_REGISTRY["ECA"](), grid)
    assert out.shape == grid.shape


def test_linformer(tokens):
    out = _grad_flows(
        ATTENTION_REGISTRY["Linformer"](dim=C, num_heads=4, proj_k=16), tokens
    )
    assert out.shape == tokens.shape


def test_efficient_self_attention(tokens):
    out = _grad_flows(
        ATTENTION_REGISTRY["EfficientSelfAttention"](
            dim=C, num_heads=4, sr_ratio=2
        ),
        tokens, H, W,
    )
    assert out.shape == tokens.shape


def test_differential_attention(tokens):
    out = _grad_flows(
        ATTENTION_REGISTRY["DifferentialAttention"](dim=C, num_heads=2), tokens
    )
    assert out.shape == tokens.shape


def test_task_specific_attention(tokens):
    out = _grad_flows(
        ATTENTION_REGISTRY["TaskSpecificAttention"](dim=C, num_tasks=3), tokens
    )
    assert out.shape == (B, 3, C)


def test_hierarchical_attention(tokens):
    out = _grad_flows(
        ATTENTION_REGISTRY["HierarchicalAttention"](dim=C, num_tasks=3), tokens
    )
    assert out.shape == (B, 3, C)


# -------------------------------------------------------------- aggregations
def test_aggregations(tokens):
    stack = tokens[:, :4, :]  # (B, 4, C)
    out = _grad_flows(AGGREGATION_REGISTRY["AdaptivePooling"](), stack)
    assert out.shape == (B, C)
    out = _grad_flows(
        AGGREGATION_REGISTRY["Concatenation"](out_features=C), stack
    )
    assert out.shape == (B, C)
    out = _grad_flows(AGGREGATION_REGISTRY["Conv1d"](), stack)
    assert out.shape == (B, C)
    mod = AGGREGATION_REGISTRY["Identity"]()
    params = mod.init(jax.random.PRNGKey(0), stack)
    np.testing.assert_array_equal(
        np.asarray(mod.apply(params, stack)), np.asarray(stack[:, 0])
    )


# ----------------------------------------------------------------- resolvers
def test_resolvers():
    feats = jax.random.normal(jax.random.PRNGKey(3), (B, C))
    out = _grad_flows(
        RESOLVER_REGISTRY["LearnedProjection"](projection_dim=8), feats
    )
    assert out.shape == (B, 8)
    mod = RESOLVER_REGISTRY["AdaptivePooling"](projection_dim=8)
    params = mod.init(jax.random.PRNGKey(0), feats)
    assert mod.apply(params, feats).shape == (B, 8)
    mod = RESOLVER_REGISTRY["Concatenation"]()
    params = mod.init(jax.random.PRNGKey(0), feats, feats)
    assert mod.apply(params, feats, feats).shape == (B, 2 * C)
    mod = RESOLVER_REGISTRY["Identity"]()
    params = mod.init(jax.random.PRNGKey(0), feats)
    np.testing.assert_array_equal(
        np.asarray(mod.apply(params, feats)), np.asarray(feats)
    )


# --------------------------------------------- config-driven aggregation pick
def test_model_build_with_nondefault_aggregation():
    """VERDICT #8 done-criterion: a MODEL.AGGREGATION config selects a
    registry aggregation inside a full mFormerV1 build and the model runs."""
    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.models.build import build_model

    cfg = get_default_config()
    cfg.DATA.TASK_KEYS_H5 = ["t1"]
    cfg.MODEL.TYPE = "mFormerV1"
    cfg.MODEL.IMG_SIZE = 32
    cfg.MODEL.DROP_PATH_RATE = 0.0
    cfg.MODEL.CONVNEXT_STAGES.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.CONVNEXT_STAGES.DIMS = [8, 16, 32, 64]
    cfg.MODEL.ROPE_STAGES.DEPTHS = [1, 1]
    cfg.MODEL.ROPE_STAGES.NUM_HEADS = [2, 2]
    cfg.MODEL.ROPE_STAGES.DIMS = [32, 64]
    cfg.MODEL.ROPE_STAGES.MLP_RATIO = [2.0, 2.0]
    cfg.DATA.META.ACTIVE = False
    cfg.MODEL.AGGREGATION.TYPE = "AdaptivePooling"

    model = build_model(cfg, num_classes={"t1": 5})
    images = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), images, None)
    out = model.apply(variables, images, None, deterministic=True)
    assert out["t1"].shape == (2, 5)
    # the alt-aggregation path replaced the Conv1d 'aggregate' Dense
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert not any("'aggregate'" in n for n in names)


def test_model_build_with_identity_aggregation():
    """Identity aggregation through MFormerV1 (round-2 review: the registry
    call passes dtype=, which IdentityAggregation must accept)."""
    import jax
    import jax.numpy as jnp

    from test_train_step import tiny_model

    model = tiny_model().clone(aggregation="Identity")
    v = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 5)),
    )
    assert "params" in v
