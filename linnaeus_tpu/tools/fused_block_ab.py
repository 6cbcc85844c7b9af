"""Chained A/B for the fused ConvNeXt BLOCK kernel (ops/fused_dwconv_mlp)
at a chosen geometry — default the 384px stage-1 training shape
(64, 96, 96, 96) where XLA's dwconv layouts were pathological (38-92 GiB/s,
docs/performance.md round-3).

Three contenders, forward and train (fwd+bwd+sgd-ish update):
  * block:  the whole block as ONE Pallas kernel (dwconv in VMEM)
  * mlp:    XLA dwconv + the round-3 Pallas fused MLP (production auto path)
  * xla:    plain XLA chain

Methodology matches bench.py: a jitted lax.fori_loop whose carry feeds the
next iteration (no elision), ended by one host read; differencing two
iteration counts cancels dispatch overhead. Pairs run interleaved in one
process so compile state and chip state are shared.

Usage:
    python -m linnaeus_tpu.tools.fused_block_ab --pairs 3
    python -m linnaeus_tpu.tools.fused_block_ab --train --pairs 3
"""

from __future__ import annotations

import argparse
import json
import time


def build(mode: str, train: bool, B: int, H: int, W: int, C: int,
          dtype_name: str = "bfloat16"):
    import jax
    import jax.numpy as jnp

    from linnaeus_tpu.ops import fused_dwconv_mlp as fb
    from linnaeus_tpu.ops import fused_mlp as fm

    dt = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    ks = jax.random.split(jax.random.PRNGKey(0), 10)
    x = jax.random.normal(ks[0], (B, H, W, C), dt)
    params = {
        "k": jax.random.normal(ks[1], (7, 7, C)) * 0.2,
        "kb": jax.random.normal(ks[2], (C,)) * 0.1,
        "ls": jax.random.normal(ks[3], (C,)) * 0.1 + 1.0,
        "lb": jax.random.normal(ks[4], (C,)) * 0.1,
        "w1": (jax.random.normal(ks[5], (C, 4 * C)) * 0.05).astype(dt),
        "b1": jax.random.normal(ks[6], (4 * C,)) * 0.1,
        "w2": (jax.random.normal(ks[7], (4 * C, C)) * 0.05).astype(dt),
        "b2": jax.random.normal(ks[8], (C,)) * 0.1,
        "g": jnp.full((C,), 0.5, jnp.float32),
    }

    def via_mlp(p, h):
        # production auto path: XLA dwconv, Pallas fused LN->MLP (+residual)
        kern = p["k"].reshape(7, 7, 1, C).astype(h.dtype)
        y = jax.lax.conv_general_dilated(
            h, kern, (1, 1), ((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        ) + p["kb"].astype(h.dtype)
        return fm.fused_convnext_mlp(
            y, h, p["ls"], p["lb"], p["w1"], p["b1"], p["w2"], p["b2"],
            p["g"],
        )

    def via_xla(p, h):
        row = lambda v: jnp.asarray(v, jnp.float32)[None, :]  # noqa: E731
        return fb._xla_reference(
            h, jnp.asarray(p["k"], jnp.float32).reshape(49, C), row(p["kb"]),
            row(p["ls"]), row(p["lb"]), p["w1"], row(p["b1"]), p["w2"],
            row(p["b2"]), row(p["g"]), 1e-6, True,
        )

    def via_block(p, h):
        return fb.fused_convnext_block(
            h, p["k"], p["kb"], p["ls"], p["lb"], p["w1"], p["b1"],
            p["w2"], p["b2"], p["g"],
        )

    f = {"block": via_block, "mlp": via_mlp, "xla": via_xla}[mode]

    if not train:
        def run(p, h, n):
            def body(i, carry):
                out = f(p, carry)
                # renormalize so 40 chained blocks don't blow up bf16
                return out * (1.0 / (1.0 + jnp.float32(1e-6))).astype(out.dtype)

            return jnp.sum(
                jax.lax.fori_loop(0, n, body, h).astype(jnp.float32)
            )

        return jax.jit(run), params, x

    def loss(p, h):
        return jnp.mean(f(p, h).astype(jnp.float32) ** 2)

    gfn = jax.value_and_grad(loss)

    def run(p, h, n):
        def body(i, carry):
            q, acc = carry
            val, grads = gfn(q, h)
            q = jax.tree.map(
                lambda a, da: a - (1e-6 * da).astype(a.dtype), q, grads
            )
            return q, acc + val

        q, acc = jax.lax.fori_loop(0, n, body, (p, jnp.float32(0.0)))
        leaves = jax.tree.leaves(q)
        return acc + sum(jnp.sum(v.astype(jnp.float32)) for v in leaves[:1])

    return jax.jit(run), params, x


def measure(mode: str, train: bool, B, H, W, C, n1: int, n2: int) -> float:
    import jax.numpy as jnp

    run_j, params, x = build(mode, train, B, H, W, C)

    def timed(n):
        t0 = time.perf_counter()
        v = float(run_j(params, x, jnp.int32(n)))
        assert v == v, "NaN"
        return time.perf_counter() - t0

    timed(1)
    t1, t2 = timed(n1), timed(n2)
    return 1000.0 * (t2 - t1) / (n2 - n1)  # ms per iteration (one block)


def main(argv=None) -> None:
    p = argparse.ArgumentParser("fused_block_ab")
    p.add_argument("--geometry", default="64x96x96x96",
                   help="BxHxWxC (default: 384px stage-1)")
    p.add_argument("--train", action="store_true",
                   help="fwd+bwd+update instead of forward-only")
    p.add_argument("--pairs", type=int, default=3)
    p.add_argument("--n1", type=int, default=5)
    p.add_argument("--n2", type=int, default=15)
    p.add_argument("--modes", default="block,mlp,xla")
    args = p.parse_args(argv)

    from linnaeus_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    B, H, W, C = (int(v) for v in args.geometry.split("x"))
    modes = args.modes.split(",")
    results = {m: [] for m in modes}
    for i in range(args.pairs):
        for m in modes:
            ms = measure(m, args.train, B, H, W, C, args.n1, args.n2)
            results[m].append(round(ms, 3))
            print(json.dumps({"pair": i, "mode": m, "ms_per_block": round(ms, 3)}),
                  flush=True)
    med = {m: sorted(v)[len(v) // 2] for m, v in results.items()}
    print(json.dumps({
        "geometry": args.geometry, "train": args.train,
        "ms_median": med, "ms_all": results,
    }))


if __name__ == "__main__":
    main()
