"""Device-trace profiler for the jitted train step.

Captures a ``jax.profiler`` trace of the production train step (the same
program ``tools/train_bench.py`` times) and converts the xplane to per-op
tables via xprof: ``hlo_stats`` (self-time / flops / bytes per HLO op) and
``roofline_model`` (bound-by classification). This is the tooling behind
the roofline decomposition in ``docs/performance.md`` — the TPU-native
replacement for the reference's pipeline-monitor-only profiling
(reference: linnaeus/h5data/base_prefetching_dataset.py:729-769 is the
closest thing the reference has; it never profiles device ops).

Usage:
    python -m linnaeus_tpu.tools.profile_step --steps 8 --out /tmp/prof_r2
    python -m linnaeus_tpu.tools.profile_step --parse-only --out /tmp/prof_r2
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def capture(out: str, batch: int, img: int, fp32_scores: bool,
            steps: int, arch: str = "v1", deinterleave: bool = True,
            v0_head_split: bool = False, moe: bool = False) -> None:
    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.tools.train_bench import build_step
    from linnaeus_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    run_j, state = build_step(batch, img, fp32_scores, remat=False,
                              arch=arch, rope_deinterleave=deinterleave,
                              v0_head_split=v0_head_split, moe=moe)
    float(run_j(state, jnp.int32(1)))  # compile + warm
    with jax.profiler.trace(out):
        float(run_j(state, jnp.int32(steps)))  # host read inside the trace


def capture_inference(out: str, batch: int, img: int, fp32_scores: bool,
                      steps: int, flash: bool = False) -> None:
    """Forward-only trace of the serving program bench.py times (same model
    construction, bf16 inputs, fori_loop with a carry-coupled input)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_model
    from linnaeus_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    model = _flagship_model(attn_fp32_softmax=fp32_scores)
    if img != 224 or flash:
        model = model.clone(img_size=(img, img), use_flash_attn=flash)
    images = jax.random.normal(
        jax.random.PRNGKey(0), (batch, img, img, 3), jnp.bfloat16
    )
    aux = jax.random.normal(jax.random.PRNGKey(1), (batch, 5), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), images, aux)["params"]

    def run(params, images, aux, n):
        def body(i, carry):
            imgs = images + (carry * 1e-12).astype(images.dtype)
            out = model.apply({"params": params}, imgs, aux,
                              deterministic=True)
            return carry + sum(
                jnp.sum(v.astype(jnp.float32)) for v in out.values()
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    run_j = jax.jit(run)
    float(run_j(params, images, aux, jnp.int32(1)))  # compile + warm
    with jax.profiler.trace(out):
        float(run_j(params, images, aux, jnp.int32(steps)))


def _xplane_paths(out: str) -> list[str]:
    paths = sorted(glob.glob(os.path.join(out, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .xplane.pb under {out}")
    return [paths[-1]]  # latest capture


def _gviz_to_rows(table: dict) -> list[dict]:
    """gviz DataTable JSON (xprof's hlo_stats output) -> list of dicts."""
    ids = [c["id"] for c in table["cols"]]
    return [
        {k: (cell or {}).get("v") for k, cell in zip(ids, r["c"])}
        for r in table["rows"]
    ]


def parse(out: str) -> dict:
    """Convert the captured xplane into per-op rows."""
    from xprof.convert import raw_to_tool_data

    paths = _xplane_paths(out)
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    return {"rows": _gviz_to_rows(json.loads(data)), "path": paths[0]}


def summarize(rows: list[dict], top: int, steps: int) -> None:
    """Aggregate hlo_stats rows by op category and print a table."""
    def f(r, k):
        try:
            return float(r.get(k) or 0)
        except (TypeError, ValueError):
            return 0.0

    tk = "total_self_time"
    by_cat: dict[str, float] = {}
    total = 0.0
    for r in rows:
        t = f(r, tk)
        total += t
        cat = str(r.get("category") or "?")
        by_cat[cat] = by_cat.get(cat, 0.0) + t

    print(f"\ntotal device self-time: {total / 1e3:.2f} ms "
          f"({total / 1e3 / steps:.2f} ms/step over {steps} steps)")
    print(f"\n{'category':<40} {'ms/step':>9} {'share':>7}")
    for cat, t in sorted(by_cat.items(), key=lambda kv: -kv[1]):
        print(f"{cat:<40} {t / 1e3 / steps:9.3f} {t / total:7.1%}")

    print(f"\ntop {top} ops (ms/step, occurrences, model GFLOP/s, HBM GiB/s,"
          f" bound_by):")
    for r in sorted(rows, key=lambda r: -f(r, tk))[:top]:
        nm = str(r.get("hlo_op_name") or "?")
        expr = str(r.get("hlo_op_expression") or "")[:64]
        print(f"  {f(r, tk) / 1e3 / steps:8.3f}  {int(f(r, 'occurrences')):>4}"
              f"  {f(r, 'model_flop_rate'):>9.1f} {f(r, 'hbm_bw'):>8.2f}"
              f"  {str(r.get('bound_by') or '?'):<8}"
              f"  {nm[:40]:<40} {expr}")


def main(argv=None) -> None:
    p = argparse.ArgumentParser("profile_step")
    p.add_argument("--out", default="/tmp/profile_step")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--img", type=int, default=224)
    p.add_argument("--fp32-scores", action="store_true")
    p.add_argument("--arch", choices=("v1", "v0"), default="v1")
    p.add_argument("--no-deinterleave", action="store_true",
                   help="v1 A/B: legacy interleaved-RoPE nn.Dense qkv")
    p.add_argument("--v0-head-split", action="store_true",
                   help="v0 A/B: weight-level head split in "
                        "RelativeAttention (default off)")
    p.add_argument("--moe", action="store_true",
                   help="trace the mFormerV1_sm_moe train step (8-expert "
                        "top-2 MoE on every 2nd RoPE block) — the routing-"
                        "overhead decomposition behind docs/performance.md")
    p.add_argument("--inference", action="store_true",
                   help="trace the forward-only serving program instead of "
                        "the train step (bench.py's exact construction)")
    p.add_argument("--flash", action="store_true",
                   help="with --inference: force Pallas flash routing")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--parse-only", action="store_true")
    p.add_argument("--dump-json", default=None,
                   help="also write raw per-op rows to this JSON file")
    args = p.parse_args(argv)

    if not args.parse_only:
        if args.inference:
            capture_inference(args.out, args.batch, args.img,
                              args.fp32_scores, args.steps, flash=args.flash)
        else:
            capture(args.out, args.batch, args.img, args.fp32_scores,
                    args.steps, arch=args.arch,
                    deinterleave=not args.no_deinterleave,
                    v0_head_split=args.v0_head_split, moe=args.moe)
    res = parse(args.out)
    if args.dump_json:
        with open(args.dump_json, "w") as fh:
            json.dump(res["rows"], fh)
    print(f"parsed {res['path']}: {len(res['rows'])} ops")
    summarize(res["rows"], args.top, args.steps)


if __name__ == "__main__":
    main()
