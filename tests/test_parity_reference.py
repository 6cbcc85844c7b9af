"""Logit parity vs the PyTorch reference implementation.

The v0 acceptance gate (BASELINE.md): fp32 logits matching the reference.
The reference package at /root/reference imports cleanly once our CfgNode is
shimmed in as yacs; we build the reference mFormerV1 in torch-cpu, export
its randomly-initialized state_dict, map it onto the Flax model
(utils/pretrained.py::load_reference_mformer_v1), and compare forward logits
on identical inputs.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def reference_pkg():
    import linnaeus_tpu.configuration.cfg_node as cfgmod

    if "yacs" not in sys.modules:
        yacs = types.ModuleType("yacs")
        yacs_config = types.ModuleType("yacs.config")
        yacs_config.CfgNode = cfgmod.CfgNode
        yacs.config = yacs_config
        sys.modules["yacs"] = yacs
        sys.modules["yacs.config"] = yacs_config
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    import linnaeus.config as ref_config
    from linnaeus.models.mFormerV1 import mFormerV1 as RefMFormerV1

    return ref_config, RefMFormerV1


TASKS = ["taxa_L10", "taxa_L20"]
NC = {"taxa_L10": 7, "taxa_L20": 3}
DIMS = [8, 16, 32, 64]
ROPE_DIMS = [32, 64]


def _ref_config(ref_config):
    cfg = ref_config.get_default_config()
    cfg.MODEL.TYPE = "mFormerV1"
    cfg.MODEL.IMG_SIZE = 64
    cfg.MODEL.IN_CHANS = 3
    cfg.MODEL.DROP_RATE = 0.0
    cfg.MODEL.DROP_PATH_RATE = 0.0
    cfg.MODEL.ATTN_DROP_RATE = 0.0
    cfg.MODEL.ONLY_LAST_CLS = False
    cfg.MODEL.USE_FLASH_ATTN = False
    CN = type(cfg)
    cfg.MODEL.CONVNEXT_STAGES = CN(new_allowed=True)
    cfg.MODEL.ROPE_STAGES = CN(new_allowed=True)
    cfg.MODEL.CONVNEXT_STAGES.DEPTHS = [1, 1, 1, 1]
    cfg.MODEL.CONVNEXT_STAGES.DIMS = list(DIMS)
    cfg.MODEL.CONVNEXT_STAGES.LAYER_SCALE_INIT_VALUE = 1e-6
    cfg.MODEL.ROPE_STAGES.DEPTHS = [1, 1]
    cfg.MODEL.ROPE_STAGES.DIMS = list(ROPE_DIMS)
    cfg.MODEL.ROPE_STAGES.NUM_HEADS = [2, 2]
    cfg.MODEL.ROPE_STAGES.MLP_RATIO = [4.0, 4.0]
    cfg.MODEL.ROPE_STAGES.ROPE_THETA = 10000.0
    cfg.MODEL.ROPE_STAGES.ROPE_MIXED = True
    cfg.DATA.TASK_KEYS_H5 = list(TASKS)
    # TEMPORAL(2) + SPATIAL(3) enabled by default in the reference config
    for task in TASKS:
        cfg.MODEL.CLASSIFICATION.HEADS[task] = type(cfg)(
            {"TYPE": "Linear"}, new_allowed=True
        )
    cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = False
    return cfg


def test_mformer_v1_logit_parity(reference_pkg):
    ref_config, RefMFormerV1 = reference_pkg
    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.utils.pretrained import load_reference_mformer_v1

    torch.manual_seed(0)
    cfg = _ref_config(ref_config)
    ref_model = RefMFormerV1(cfg, num_classes=NC, taxonomy_tree=None)
    ref_model.eval()

    rng = np.random.default_rng(0)
    images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    meta = rng.normal(size=(2, 5)).astype(np.float32)

    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(images).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(meta),
        )
    ref_logits = {t: ref_out[t].numpy() for t in TASKS}

    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    flax_model = MFormerV1(
        img_size=(64, 64),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=tuple(DIMS),
        rope_depths=(1, 1),
        rope_dims=tuple(ROPE_DIMS),
        rope_num_heads=(2, 2),
        rope_mlp_ratio=(4.0, 4.0),
        drop_path_rate=0.0,
        rope_mixed=True,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=tuple(TASKS),
        num_classes=NC,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
        # bit-compatibility with the reference's silent complex->real cast
        rope_fidelity="reference_cos",
        act_exact=True,
    )
    params = flax_model.init(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(meta)
    )["params"]
    loaded = load_reference_mformer_v1(
        params, sd,
        convnext_depths=(1, 1, 1, 1),
        rope_depths=(1, 1),
        meta_names=("TEMPORAL", "SPATIAL"),
        task_keys=tuple(TASKS),
    )
    out = flax_model.apply(
        {"params": loaded}, jnp.asarray(images), jnp.asarray(meta)
    )
    for t in TASKS:
        ours = np.asarray(out[t], np.float32)
        theirs = ref_logits[t]
        max_diff = np.abs(ours - theirs).max()
        scale = max(np.abs(theirs).max(), 1e-6)
        assert max_diff < 1e-4 or max_diff / scale < 2e-4, (
            f"{t}: max abs diff {max_diff:.3e} (scale {scale:.3e})"
        )


def test_every_reference_tensor_is_consumed(reference_pkg):
    """All reference mFormerV1 parameters must map onto flax params — catches
    silent drift in either architecture."""
    ref_config, RefMFormerV1 = reference_pkg
    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.utils import pretrained as P

    torch.manual_seed(0)
    cfg = _ref_config(ref_config)
    ref_model = RefMFormerV1(cfg, num_classes=NC, taxonomy_tree=None)
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    flax_model = MFormerV1(
        img_size=(64, 64),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=tuple(DIMS),
        rope_depths=(1, 1),
        rope_dims=tuple(ROPE_DIMS),
        rope_num_heads=(2, 2),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=tuple(TASKS),
        num_classes=NC,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
    )
    params = flax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 5))
    )["params"]

    # count params on both sides: they must be identical in total size
    ref_total = sum(int(np.prod(v.shape)) for v in sd.values())
    flax_total = sum(int(p.size) for p in jax.tree.leaves(params))
    assert ref_total == flax_total, (ref_total, flax_total)


def test_rope_attention_block_parity(reference_pkg):
    """Block-level parity with large-magnitude inputs — exposes the RoPE
    path directly. The reference's mixed-RoPE silently casts the complex
    phases to real (rope_2d_mhsa.py:408), degrading rotation to cos(theta)
    scaling; rope_fidelity='reference_cos' reproduces that exactly, while
    the default 'rotate' applies correct RoPE (and intentionally diverges).
    """
    import jax
    import jax.numpy as jnp
    from flax.core import unfreeze

    from linnaeus.models.blocks.rope_2d_mhsa import RoPE2DAttention as RefAttn
    from linnaeus_tpu.models.blocks.rope_mhsa import RoPE2DAttention as MyAttn

    torch.manual_seed(0)
    ref = RefAttn(dim=16, img_grid_size=(4, 4), extra_token_num=1,
                  num_heads=2, rope_mixed=True, qkv_bias=True)
    ref.eval()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 17, 16)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x), H=4, W=4).numpy()

    def run(fidelity):
        mine = MyAttn(dim=16, img_grid_size=(4, 4), extra_token_num=1,
                      num_heads=2, rope_mixed=True, qkv_bias=True,
                      rope_fidelity=fidelity)
        p = unfreeze(mine.init(jax.random.PRNGKey(0), jnp.asarray(x)))["params"]
        p["qkv"]["kernel"] = ref.qkv.weight.detach().numpy().T
        p["qkv"]["bias"] = ref.qkv.bias.detach().numpy()
        p["proj"]["kernel"] = ref.proj.weight.detach().numpy().T
        p["proj"]["bias"] = ref.proj.bias.detach().numpy()
        p["freqs"] = ref.freqs.detach().numpy()
        return np.asarray(mine.apply({"params": p}, jnp.asarray(x)))

    compat = run("reference_cos")
    np.testing.assert_allclose(compat, ref_out, atol=2e-6)

    correct = run("rotate")
    # correct rotation must differ measurably from the buggy reference here
    assert np.abs(correct - ref_out).max() > 1e-3


def test_mformer_v0_logit_parity(reference_pkg):
    """mFormerV0 parity: exercises BN running stats, MBConv+SE, maxpool,
    OverlapPatchEmbed, and RelativeAttention bias tables."""
    ref_config, _ = reference_pkg
    from linnaeus.models.mFormerV0 import mFormerV0 as RefV0

    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.models import MFormerV0
    from linnaeus_tpu.utils.pretrained import load_metaformer_into_mformer_v0

    torch.manual_seed(0)
    cfg = ref_config.get_default_config()
    CN = type(cfg)
    cfg.MODEL.TYPE = "mFormerV0"
    cfg.MODEL.IMG_SIZE = 64
    cfg.MODEL.DROP_RATE = 0.0
    cfg.MODEL.DROP_PATH_RATE = 0.0
    cfg.MODEL.ATTN_DROP_RATE = 0.0
    cfg.MODEL.ONLY_LAST_CLS = False
    cfg.MODEL.CONV_STAGES = CN(new_allowed=True)
    cfg.MODEL.CONV_STAGES.STEM_OUT = 8
    cfg.MODEL.CONV_STAGES.EMBED_DIMS = [8, 12]
    cfg.MODEL.CONV_STAGES.OUT_CHANNELS = [12, 24]
    cfg.MODEL.CONV_STAGES.DEPTHS = [1, 1]
    cfg.MODEL.CONV_STAGES.STRIDE_SEQS = [[1], [2]]
    cfg.MODEL.ATTENTION_STAGES = CN(new_allowed=True)
    cfg.MODEL.ATTENTION_STAGES.EMBED_DIMS = [32, 64]
    cfg.MODEL.ATTENTION_STAGES.DEPTHS = [1, 1]
    cfg.MODEL.ATTENTION_STAGES.STRIDE_SEQS = [[2], [2]]
    cfg.MODEL.ATTENTION_STAGES.NUM_HEADS = [2, 2]
    cfg.MODEL.ATTENTION_STAGES.MLP_RATIO = [4.0, 4.0]
    cfg.DATA.TASK_KEYS_H5 = list(TASKS)
    for task in TASKS:
        cfg.MODEL.CLASSIFICATION.HEADS[task] = CN(
            {"TYPE": "Linear"}, new_allowed=True
        )
    cfg.TRAIN.GRADIENT_CHECKPOINTING.ENABLED_NORMAL_STEPS = False

    ref_model = RefV0(cfg, num_classes=NC, taxonomy_tree=None)
    ref_model.eval()
    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    meta = rng.normal(size=(2, 5)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref_model(
            torch.from_numpy(images).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(meta),
        )
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    flax_model = MFormerV0(
        img_size=(64, 64),
        stage_dims=(8, 12, 24, 32, 64),
        mbconv_depths=(1, 1),
        attn_depths=(1, 1),
        num_heads=(2, 2),
        mlp_ratio=(4.0, 4.0),
        drop_path_rate=0.0,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=tuple(TASKS),
        num_classes=NC,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
        act_exact=True,
    )
    variables = flax_model.init(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(meta)
    )
    params, stats = load_metaformer_into_mformer_v0(
        variables["params"], variables["batch_stats"], sd,
        mbconv_depths=(1, 1), attn_depths=(1, 1),
        meta_names=("TEMPORAL", "SPATIAL"), task_keys=tuple(TASKS),
    )
    out = flax_model.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(images), jnp.asarray(meta),
    )
    for t in TASKS:
        ours = np.asarray(out[t], np.float32)
        theirs = ref_out[t].numpy()
        max_diff = np.abs(ours - theirs).max()
        scale = max(np.abs(theirs).max(), 1e-6)
        assert max_diff < 1e-4 or max_diff / scale < 2e-4, (
            f"{t}: max abs diff {max_diff:.3e} (scale {scale:.3e})"
        )


@pytest.mark.slow
def test_mformer_v1_sm_full_geometry_param_equality(reference_pkg):
    """Param-count equality at the FULL mFormerV1_sm geometry (arch preset
    vs the actual torch reference model, nc=the reference estimator's
    defaults). The reference's own analytic estimator
    (tools/estimate_model_complexity.py) under-counts by ~10% (26.79M
    claimed vs 29.89M real); this pins the real number."""
    ref_config, RefMFormerV1 = reference_pkg
    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.configuration import get_default_config
    from linnaeus_tpu.configuration.archs import apply_arch
    from linnaeus_tpu.models.build import build_model

    nc = {"taxa_L10": 684, "taxa_L20": 179, "taxa_L30": 40, "taxa_L40": 4}

    cfg = ref_config.get_default_config()
    CN = type(cfg)
    cfg.MODEL.TYPE = "mFormerV1"
    cfg.MODEL.IMG_SIZE = 384
    cfg.MODEL.ONLY_LAST_CLS = False
    cfg.MODEL.USE_FLASH_ATTN = False
    cfg.MODEL.CONVNEXT_STAGES = CN(new_allowed=True)
    cfg.MODEL.ROPE_STAGES = CN(new_allowed=True)
    cfg.MODEL.CONVNEXT_STAGES.DEPTHS = [3, 3, 9, 3]
    cfg.MODEL.CONVNEXT_STAGES.DIMS = [96, 192, 384, 768]
    cfg.MODEL.CONVNEXT_STAGES.LAYER_SCALE_INIT_VALUE = 1e-6
    cfg.MODEL.ROPE_STAGES.DEPTHS = [5, 2]
    cfg.MODEL.ROPE_STAGES.DIMS = [384, 768]
    cfg.MODEL.ROPE_STAGES.NUM_HEADS = [6, 12]
    cfg.MODEL.ROPE_STAGES.MLP_RATIO = [4.0, 4.0]
    cfg.MODEL.ROPE_STAGES.ROPE_THETA = 10000.0
    cfg.MODEL.ROPE_STAGES.ROPE_MIXED = True
    cfg.DATA.TASK_KEYS_H5 = list(nc)
    for t in nc:
        cfg.MODEL.CLASSIFICATION.HEADS[t] = CN(
            {"TYPE": "Linear"}, new_allowed=True
        )
    ref_model = RefMFormerV1(cfg, num_classes=nc)
    n_ref = sum(p.numel() for p in ref_model.parameters())

    ours = get_default_config()
    ours.MODEL.IMG_SIZE = 384
    ours.DATA.TASK_KEYS_H5 = list(nc)
    apply_arch(ours, "mFormerV1_sm")
    model = build_model(ours, num_classes=nc)
    meta_dim = sum(d for _, d in model.meta_components)
    v = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jnp.zeros((1, 384, 384, 3)), jnp.zeros((1, meta_dim)),
    )
    n_ours = sum(
        int(np.prod(x.shape)) if x.shape else 1
        for x in jax.tree.leaves(v["params"])
    )
    assert n_ours == n_ref == 29_886_574


@pytest.mark.slow
def test_training_dynamics_parity(reference_pkg):
    """N-step loss-trajectory parity vs the reference hot loop's math
    (train.py:13-443): identical converted initial weights, identical
    synthetic batches, mixing/masking off, soft-target CE summed over tasks
    (per-task batch mean x unit task weight — the reference's
    weighted_hierarchical_loss composition, loss/hierarchical_loss.py), SGD
    without momentum on both sides, fp32, CPU. Catches drift in the step's
    forward/loss/backward/update math that single-forward logit parity
    cannot (e.g. a wrong loss reduction, a silently scaled gradient).

    Known acceptable divergence: fp32 summation order differs between
    XLA fusions and torch kernels, so per-step losses drift ~1e-6
    relative at step 1, growing with step count; tolerances below bound
    the COMPOUNDED drift over 30 steps.
    """
    ref_config, RefMFormerV1 = reference_pkg
    import jax
    import jax.numpy as jnp
    import optax

    from linnaeus_tpu.data.collate import MixConfig
    from linnaeus_tpu.loss import soft_target_cross_entropy
    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.train.state import create_train_state
    from linnaeus_tpu.train.step import ScheduleScalars, make_train_step
    from linnaeus_tpu.utils.pretrained import load_reference_mformer_v1

    torch.manual_seed(0)
    cfg = _ref_config(ref_config)
    ref_model = RefMFormerV1(cfg, num_classes=NC, taxonomy_tree=None)
    ref_model.train()  # all drop rates are 0, so train==eval numerics
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    flax_model = MFormerV1(
        img_size=(64, 64),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=tuple(DIMS),
        rope_depths=(1, 1),
        rope_dims=tuple(ROPE_DIMS),
        rope_num_heads=(2, 2),
        rope_mlp_ratio=(4.0, 4.0),
        drop_path_rate=0.0,
        rope_mixed=True,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=tuple(TASKS),
        num_classes=NC,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
        rope_fidelity="reference_cos",
        act_exact=True,
    )
    params0 = flax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 64, 64, 3)), jnp.zeros((2, 5))
    )["params"]
    params0 = load_reference_mformer_v1(
        params0, sd,
        convnext_depths=(1, 1, 1, 1),
        rope_depths=(1, 1),
        meta_names=("TEMPORAL", "SPATIAL"),
        task_keys=tuple(TASKS),
    )

    # fixed synthetic batch cycle; labels 1..C-1 (no nulls -> the null
    # branch is identity on both sides)
    n_steps, B = 30, 4
    rng = np.random.default_rng(42)
    batches = []
    for _ in range(6):
        batches.append({
            "images": rng.normal(size=(B, 64, 64, 3)).astype(np.float32) * 0.5,
            "aux": rng.normal(size=(B, 5)).astype(np.float32),
            "targets": {
                t: rng.integers(1, NC[t], B).astype(np.int32) for t in TASKS
            },
        })

    lr = 0.05

    # ---- torch side: forward -> sum of per-task mean soft-CE -> SGD
    opt = torch.optim.SGD(ref_model.parameters(), lr=lr, momentum=0.0)
    ref_losses = []
    for i in range(n_steps):
        b = batches[i % len(batches)]
        images_t = torch.from_numpy(b["images"]).permute(0, 3, 1, 2).contiguous()
        meta_t = torch.from_numpy(b["aux"])
        out = ref_model(images_t, meta_t)
        total = None
        for t in TASKS:
            onehot = torch.nn.functional.one_hot(
                torch.from_numpy(b["targets"][t]).long(), NC[t]
            ).float()
            logp = torch.nn.functional.log_softmax(out[t], dim=-1)
            task_loss = -(onehot * logp).sum(-1).mean()
            total = task_loss if total is None else total + task_loss
        opt.zero_grad()
        total.backward()
        opt.step()
        ref_losses.append(float(total.detach()))

    # ---- our side: the production train step, mixing/masking disabled
    state = create_train_state(
        flax_model, params0, optax.sgd(lr), num_tasks=len(TASKS),
        rng=jax.random.PRNGKey(0),
    )
    criteria = {t: soft_target_cross_entropy for t in TASKS}
    step = jax.jit(make_train_step(
        criteria, tuple(TASKS),
        MixConfig(mixup_enabled=False, cutmix_enabled=False),
        clip_grad=0.0, has_meta=True, num_classes=NC,
    ))
    scalars = ScheduleScalars.zeros(5)
    our_losses = []
    for i in range(n_steps):
        b = batches[i % len(batches)]
        state, metrics = step(
            state,
            {"images": jnp.asarray(b["images"]),
             "aux": jnp.asarray(b["aux"]),
             "targets": {t: jnp.asarray(v) for t, v in b["targets"].items()}},
            scalars,
        )
        our_losses.append(float(metrics["loss"]))

    ours = np.asarray(our_losses)
    theirs = np.asarray(ref_losses)
    # early steps: tight; whole trajectory: bounded compounded drift
    np.testing.assert_allclose(ours[:5], theirs[:5], rtol=2e-4)
    np.testing.assert_allclose(ours, theirs, rtol=5e-3)
    # the trajectory actually went somewhere (parameters are updating —
    # with random labels at this lr the direction is not guaranteed)
    assert abs(theirs[-1] - theirs[0]) > 0.02
    assert float(np.std(theirs)) > 1e-3


def test_export_to_reference_round_trip(reference_pkg):
    """Migration path back: export OUR trained params to a torch state_dict,
    load it into the REFERENCE's mFormerV1, and require logit parity — the
    inverse direction of test_mformer_v1_logit_parity."""
    ref_config, RefMFormerV1 = reference_pkg
    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.models import MFormerV1
    from linnaeus_tpu.utils.pretrained import export_reference_mformer_v1

    torch.manual_seed(0)
    cfg = _ref_config(ref_config)
    ref_model = RefMFormerV1(cfg, num_classes=NC, taxonomy_tree=None)
    ref_model.eval()

    flax_model = MFormerV1(
        img_size=(64, 64),
        convnext_depths=(1, 1, 1, 1),
        convnext_dims=tuple(DIMS),
        rope_depths=(1, 1),
        rope_dims=tuple(ROPE_DIMS),
        rope_num_heads=(2, 2),
        rope_mlp_ratio=(4.0, 4.0),
        drop_path_rate=0.0,
        rope_mixed=True,
        meta_components=(("TEMPORAL", 2), ("SPATIAL", 3)),
        task_keys=tuple(TASKS),
        num_classes=NC,
        head_configs={t: {"TYPE": "Linear"} for t in TASKS},
        rope_fidelity="reference_cos",
        act_exact=True,
    )
    rng = np.random.default_rng(1)
    images = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    meta = rng.normal(size=(2, 5)).astype(np.float32)
    params = flax_model.init(
        jax.random.PRNGKey(3), jnp.asarray(images), jnp.asarray(meta)
    )["params"]

    sd = export_reference_mformer_v1(
        params,
        convnext_depths=(1, 1, 1, 1),
        rope_depths=(1, 1),
        meta_names=("TEMPORAL", "SPATIAL"),
        task_keys=tuple(TASKS),
    )
    missing, unexpected = ref_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    # everything we export must land; the reference may carry extra buffers
    assert not unexpected, f"exported keys the reference rejects: {unexpected}"

    ours = flax_model.apply(
        {"params": params}, jnp.asarray(images), jnp.asarray(meta)
    )
    with torch.no_grad():
        theirs = ref_model(
            torch.from_numpy(images).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(meta),
        )
    for t in TASKS:
        a = np.asarray(ours[t], np.float32)
        b = theirs[t].numpy()
        max_diff = np.abs(a - b).max()
        scale = max(np.abs(b).max(), 1e-6)
        assert max_diff < 1e-4 or max_diff / scale < 2e-4, (
            f"{t}: export round-trip diff {max_diff:.3e} (scale {scale:.3e})"
        )
