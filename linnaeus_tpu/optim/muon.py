"""Muon optimizer — Newton-Schulz-orthogonalized momentum, as an optax transform.

Behavioral spec from the reference (optimizers/muon.py:27-430): SGD-momentum
(lerp form), optional Nesterov, then Newton-Schulz-5 orthogonalization of the
2D update (4D conv kernels are flattened to 2D), a shape-based scaling factor
``max(1, rows/cols)**0.5``, and decoupled weight decay.

TPU-first: the NS iteration is five bf16 matmuls straight onto the MXU; the
reference's DistributedMuon (round-robin sharded NS + bf16 all_gather,
muon.py:193-430) is unnecessary — under pjit the whole update is sharded by
XLA along the mesh automatically, so one code path serves 1..N chips.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def zeropower_via_newtonschulz5(G: jnp.ndarray, steps: int = 5) -> jnp.ndarray:
    """Orthogonalize (zeroth matrix power) via quintic Newton-Schulz in bf16."""
    assert G.ndim >= 2
    a, b, c = 3.4445, -4.7750, 2.0315
    X = G.astype(jnp.bfloat16)
    transposed = G.shape[-2] > G.shape[-1]
    if transposed:
        X = jnp.swapaxes(X, -1, -2)
    norm = jnp.sqrt(
        jnp.sum(jnp.square(X.astype(jnp.float32)), axis=(-2, -1), keepdims=True)
    ).astype(jnp.bfloat16)
    X = X / (norm + 1e-7)
    for _ in range(steps):
        A = X @ jnp.swapaxes(X, -1, -2)
        B = b * A + c * (A @ A)
        X = a * X + B @ X
    if transposed:
        X = jnp.swapaxes(X, -1, -2)
    return X.astype(G.dtype)


def _is_muon_param(p: jnp.ndarray) -> bool:
    """Muon applies to 2D+ params (matrices / conv kernels); 1D and scalars
    (biases, norms, cls tokens with leading singleton dims collapse below)
    fall through to the caller's fallback optimizer."""
    return p.ndim >= 2 and min(p.shape) > 1


class MuonState(NamedTuple):
    momentum: optax.Updates


def scale_by_muon(
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
    apply_scaling: bool = True,
    strict: bool = False,
) -> optax.GradientTransformation:
    """Core Muon transform (no lr, no wd). Non-2D leaves pass through raw.

    ``strict`` (OPTIMIZER.MUON.STRICT, reference optimizers/muon.py:115-121):
    raise at init on matrix-like params outside the reference's supported
    2D/4D contract — rank-3/5+ tensors (which the update would flatten on an
    arbitrary axis split) and matrices with a singleton dim (which fall
    through to momentum-SGD here). The torch reference raises for exactly
    the non-2D/4D set; non-strict mode handles both cases as documented in
    ``_is_muon_param``.
    """

    def init_fn(params):
        if strict:
            bad = [
                tuple(p.shape)
                for p in jax.tree.leaves(params)
                if p.ndim >= 2 and (p.ndim not in (2, 4) or min(p.shape) <= 1)
            ]
            if bad:
                raise ValueError(
                    "Muon strict mode: matrix-like params must be 2D or 4D "
                    "with no singleton dims (rank-3/5+ would be flattened "
                    "on an arbitrary split; singleton-dim matrices fall "
                    f"through to momentum-SGD); offending shapes: {bad[:5]}"
                )
        return MuonState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params

        def one(g, buf):
            new_buf = buf * momentum + g * (1.0 - momentum)
            if not _is_muon_param(g):
                return new_buf, new_buf
            d = g * (1.0 - momentum) + new_buf * momentum if nesterov else new_buf
            shape = d.shape
            if d.ndim > 2:
                d2 = d.reshape(shape[0], -1)
            else:
                d2 = d
            o = zeropower_via_newtonschulz5(d2, ns_steps)
            if apply_scaling:
                scale = max(1.0, d2.shape[-2] / d2.shape[-1]) ** 0.5
                o = o * scale
            return o.reshape(shape), new_buf

        flat_g, treedef = jax.tree.flatten(updates)
        flat_b = treedef.flatten_up_to(state.momentum)
        outs = [one(g, b) for g, b in zip(flat_g, flat_b)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_momentum = treedef.unflatten([o[1] for o in outs])
        return new_updates, MuonState(momentum=new_momentum)

    return optax.GradientTransformation(init_fn, update_fn)


def muon(
    learning_rate: optax.ScalarOrSchedule,
    momentum: float = 0.95,
    nesterov: bool = True,
    ns_steps: int = 5,
    weight_decay: float = 0.0,
    apply_scaling: bool = True,
    strict: bool = False,
) -> optax.GradientTransformation:
    """Full Muon: orthogonalized momentum + decoupled weight decay + lr."""
    chain = [scale_by_muon(momentum, nesterov, ns_steps, apply_scaling, strict)]
    if weight_decay > 0:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*chain)
