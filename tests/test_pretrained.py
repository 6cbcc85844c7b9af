"""Pretrained-conversion tests with synthetic torch checkpoints."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from linnaeus_tpu.models import MFormerV1
from linnaeus_tpu.utils.pretrained import (
    convert_conv_kernel,
    convert_linear_kernel,
    load_stitched_pretrained,
    load_torch_state_dict,
)

DEPTHS = (1, 1, 1, 1)
DIMS = (8, 16, 32, 64)
ROPE_DEPTHS = (1, 1)
ROPE_DIMS = (32, 64)


def tiny_model():
    return MFormerV1(
        img_size=(32, 32),
        convnext_depths=DEPTHS,
        convnext_dims=DIMS,
        rope_depths=ROPE_DEPTHS,
        rope_dims=ROPE_DIMS,
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        task_keys=("t1",),
        num_classes={"t1": 4},
        head_configs={"t1": {"TYPE": "Linear"}},
    )


def synthetic_convnext_sd():
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {
        "downsample_layers.0.0.weight": t(DIMS[0], 3, 4, 4),
        "downsample_layers.0.0.bias": t(DIMS[0]),
        "downsample_layers.0.1.weight": t(DIMS[0]),
        "downsample_layers.0.1.bias": t(DIMS[0]),
    }
    for stage, dim in ((0, DIMS[0]), (1, DIMS[1])):
        p = f"stages.{stage}.0"
        sd.update({
            f"{p}.dwconv.weight": t(dim, 1, 7, 7),
            f"{p}.dwconv.bias": t(dim),
            f"{p}.norm.weight": t(dim),
            f"{p}.norm.bias": t(dim),
            f"{p}.pwconv1.weight": t(4 * dim, dim),
            f"{p}.pwconv1.bias": t(4 * dim),
            f"{p}.pwconv2.weight": t(dim, 4 * dim),
            f"{p}.pwconv2.bias": t(dim),
            f"{p}.gamma": t(dim),
        })
    for i, (din, dout) in enumerate(
        ((DIMS[0], DIMS[1]), (DIMS[1], DIMS[2]), (DIMS[2], DIMS[3])), start=1
    ):
        sd.update({
            f"downsample_layers.{i}.0.weight": t(din),
            f"downsample_layers.{i}.0.bias": t(din),
            f"downsample_layers.{i}.1.weight": t(dout, din, 2, 2),
            f"downsample_layers.{i}.1.bias": t(dout),
        })
    return sd


def synthetic_ropevit_sd():
    g = torch.Generator().manual_seed(1)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    sd = {}
    for blk, dim in ((0, ROPE_DIMS[0]), (1, ROPE_DIMS[1])):
        p = f"blocks.{blk}"
        sd.update({
            f"{p}.norm1.weight": t(dim),
            f"{p}.norm1.bias": t(dim),
            f"{p}.attn.qkv.weight": t(3 * dim, dim),
            f"{p}.attn.qkv.bias": t(3 * dim),
            f"{p}.attn.proj.weight": t(dim, dim),
            f"{p}.attn.proj.bias": t(dim),
            f"{p}.attn.freqs": t(2, 2, dim // 2 // 2),
            f"{p}.norm2.weight": t(dim),
            f"{p}.norm2.bias": t(dim),
            f"{p}.mlp.fc1.weight": t(4 * dim, dim),
            f"{p}.mlp.fc1.bias": t(4 * dim),
            f"{p}.mlp.fc2.weight": t(dim, 4 * dim),
            f"{p}.mlp.fc2.bias": t(dim),
        })
    return sd


def test_kernel_conversions():
    w = np.arange(24).reshape(2, 3, 2, 2).astype(np.float32)  # OIHW
    k = convert_conv_kernel(w)
    assert k.shape == (2, 2, 3, 2)  # HWIO
    lin = np.arange(6).reshape(2, 3).astype(np.float32)
    assert convert_linear_kernel(lin).shape == (3, 2)


def test_stitched_loading_changes_params(tmp_path):
    model = tiny_model()
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, None)["params"]

    conv_path = str(tmp_path / "convnext.pth")
    rope_path = str(tmp_path / "ropevit.pth")
    torch.save(synthetic_convnext_sd(), conv_path)
    torch.save(synthetic_ropevit_sd(), rope_path)

    loaded = load_stitched_pretrained(
        params, conv_path, rope_path,
        convnext_depths=DEPTHS, rope_depths=ROPE_DEPTHS,
    )
    # stem conv kernel now equals the transposed torch tensor
    sd = load_torch_state_dict(conv_path)
    np.testing.assert_allclose(
        np.asarray(loaded["stem"]["Conv_0"]["kernel"]),
        convert_conv_kernel(sd["downsample_layers.0.0.weight"]),
        rtol=1e-6,
    )
    # rope qkv kernel transposed from torch
    rsd = load_torch_state_dict(rope_path)
    np.testing.assert_allclose(
        np.asarray(loaded["stage3_block0"]["attn"]["qkv"]["kernel"]),
        convert_linear_kernel(rsd["blocks.0.attn.qkv.weight"]),
        rtol=1e-6,
    )
    # heads untouched (random init preserved)
    np.testing.assert_allclose(
        np.asarray(loaded["head"]["head_t1"]["Dense_0"]["kernel"]),
        np.asarray(params["head"]["head_t1"]["Dense_0"]["kernel"]),
        rtol=1e-6,
    )
    # model still runs with loaded params
    out = model.apply({"params": loaded}, x, None)
    assert np.isfinite(np.asarray(out["t1"])).all()


def test_shape_mismatch_skipped(tmp_path):
    model = tiny_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), None
    )["params"]
    bad_sd = {"downsample_layers.0.0.weight": torch.randn(99, 3, 4, 4)}
    path = str(tmp_path / "bad.pth")
    torch.save(bad_sd, path)
    loaded = load_stitched_pretrained(params, path, None, DEPTHS, ROPE_DEPTHS)
    np.testing.assert_allclose(
        np.asarray(loaded["stem"]["Conv_0"]["kernel"]),
        np.asarray(params["stem"]["Conv_0"]["kernel"]),
    )


def test_metaformer_v0_remap(tmp_path):
    from linnaeus_tpu.models import MFormerV0
    from linnaeus_tpu.utils.pretrained import load_metaformer_into_mformer_v0

    model = MFormerV0(
        img_size=(64, 64),
        stage_dims=(8, 12, 24, 32, 64),
        mbconv_depths=(1, 1),
        attn_depths=(1, 1),
        num_heads=(2, 2),
        drop_path_rate=0.0,
        task_keys=("t1",),
        num_classes={"t1": 4},
        head_configs={"t1": {"TYPE": "Linear"}},
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), None
    )
    g = torch.Generator().manual_seed(0)

    def t(*shape):
        return torch.randn(*shape, generator=g)

    # minimal MetaFG-style state dict: stem conv0 + bn, one attention block
    sd = {
        "stage_0.0.weight": t(6, 3, 3, 3),  # 3*(8//4)=6 out
        "stage_0.1.weight": t(6),
        "stage_0.1.bias": t(6),
        "stage_0.1.running_mean": t(6),
        "stage_0.1.running_var": torch.abs(t(6)) + 0.5,
        "stage_3.0.attn.qkv.weight": t(96, 32),
        "stage_3.0.attn.qkv.bias": t(96),
        "norm_1.weight": t(32),
        "norm_1.bias": t(32),
        "cls_token_1": t(1, 1, 32),
    }
    new_params, new_stats = load_metaformer_into_mformer_v0(
        variables["params"], variables["batch_stats"], sd,
        mbconv_depths=(1, 1), attn_depths=(1, 1),
    )
    from linnaeus_tpu.utils.pretrained import convert_conv_kernel

    np.testing.assert_allclose(
        np.asarray(new_params["stem_conv0"]["kernel"]),
        convert_conv_kernel(sd["stage_0.0.weight"].numpy()),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_stats["stem_bn0"]["mean"]),
        sd["stage_0.1.running_mean"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_params["cls_token_1"]),
        sd["cls_token_1"].numpy(), rtol=1e-6,
    )
    # model still runs with the grafted params
    out = model.apply(
        {"params": new_params, "batch_stats": new_stats},
        jnp.zeros((1, 64, 64, 3)), None,
    )
    assert np.isfinite(np.asarray(out["t1"])).all()


# ------------------------------------------------- MoE upcycling + config entry
from linnaeus_tpu.utils.pretrained import (  # noqa: E402
    densify_moe_params,
    load_pretrained,
    upcycle_dense_to_moe,
)


def tiny_moe_model():
    return MFormerV1(
        img_size=(32, 32),
        convnext_depths=DEPTHS,
        convnext_dims=DIMS,
        rope_depths=ROPE_DEPTHS,
        rope_dims=ROPE_DIMS,
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        task_keys=("t1",),
        num_classes={"t1": 4},
        head_configs={"t1": {"TYPE": "Linear"}},
        moe_num_experts=2,
        moe_top_k=2,
        moe_capacity_factor=8.0,
        moe_every_n=1,
    )


def test_densify_matches_dense_twin_tree():
    """densify_moe_params must produce exactly the dense twin's param tree
    (same paths, same shapes) so the torch loaders can run unchanged."""
    from flax.traverse_util import flatten_dict

    x = jnp.zeros((1, 32, 32, 3))
    mp = tiny_moe_model().init(jax.random.PRNGKey(0), x, None)["params"]
    dp = tiny_model().init(jax.random.PRNGKey(0), x, None)["params"]
    mflat = flatten_dict(densify_moe_params(mp), sep="/")
    dflat = flatten_dict(dp, sep="/")
    assert set(mflat) == set(dflat)
    for k, v in dflat.items():
        assert mflat[k].shape == np.asarray(v).shape, k


def test_upcycle_forward_matches_dense_twin():
    """Sparse upcycling invariant: identical experts + normalized top-k
    gates + ample capacity -> upcycled MoE forward == dense forward."""
    moe, dense = tiny_moe_model(), tiny_model()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    mp = moe.init(jax.random.PRNGKey(0), x, None)["params"]
    dp = dense.init(jax.random.PRNGKey(1), x, None)["params"]
    up = upcycle_dense_to_moe(dp, mp)
    y_moe = moe.apply({"params": up}, x, None)
    y_dense = dense.apply({"params": dp}, x, None)
    np.testing.assert_allclose(
        np.asarray(y_moe["t1"]), np.asarray(y_dense["t1"]), atol=1e-4
    )
    # router kept its fresh init (not zero, not from dense)
    r = np.asarray(up["stage3_block0"]["mlp"]["router"])
    assert np.abs(r).sum() > 0


def test_load_pretrained_config_stitched_into_moe(tmp_path):
    """Config-driven entry: stitched torch ckpts load into an MoE model via
    the dense template and get replicated into every expert."""
    from linnaeus_tpu.configuration import get_default_config

    conv_path = str(tmp_path / "c.pth")
    rope_path = str(tmp_path / "r.pth")
    torch.save(synthetic_convnext_sd(), conv_path)
    torch.save(synthetic_ropevit_sd(), rope_path)
    cfg = get_default_config()
    cfg.MODEL.PRETRAINED_CONVNEXT = conv_path
    cfg.MODEL.PRETRAINED_ROPEVIT = rope_path

    model = tiny_moe_model()
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, None)["params"]
    new_params, _ = load_pretrained(cfg, model, params, None)

    rsd = load_torch_state_dict(rope_path)
    wi = np.asarray(new_params["stage3_block0"]["mlp"]["wi"])
    want = convert_linear_kernel(rsd["blocks.0.mlp.fc1.weight"])
    assert wi.shape[0] == 2
    for e in range(wi.shape[0]):
        np.testing.assert_allclose(wi[e], want, rtol=1e-6)
    csd = load_torch_state_dict(conv_path)
    np.testing.assert_allclose(
        np.asarray(new_params["stem"]["Conv_0"]["kernel"]),
        convert_conv_kernel(csd["downsample_layers.0.0.weight"]),
        rtol=1e-6,
    )
    out = model.apply({"params": new_params}, x, None)
    assert np.isfinite(np.asarray(out["t1"])).all()


def test_load_pretrained_noop_without_config_keys():
    from linnaeus_tpu.configuration import get_default_config

    cfg = get_default_config()
    model = tiny_model()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), None
    )["params"]
    out_params, out_stats = load_pretrained(cfg, model, params, None)
    assert out_params is params and out_stats is None
