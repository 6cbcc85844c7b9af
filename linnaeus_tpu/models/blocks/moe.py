"""Mixture-of-Experts MLP (V-MoE-style) with expert parallelism.

No reference analog: the reference's MLPs are dense (models/blocks/mlp.py:11)
and its only parallelism is DDP (SURVEY §2.8). This block is the
capacity-scaling extension for the reserved 'model' mesh axis: replace the
dense transformer MLP on selected RoPE blocks with a bank of E expert MLPs
and route each token to its top-k experts (Riquelme et al. 2021, V-MoE;
Fedus et al. 2021, Switch). Expert weight banks carry a leading E axis that
shards over the 'model' mesh axis (``parallel/mesh.py::ep_param_sharding``)
— XLA's SPMD partitioner turns the dispatch/combine einsums into the
all-to-alls, so expert parallelism needs no explicit collectives.

TPU-first design choices:
  * dense one-hot dispatch/combine einsums (MXU-friendly; no gather/scatter
    with data-dependent shapes — everything is static for XLA);
  * per-image capacity (positions computed within each batch row) so the
    batch dim stays a clean data-parallel dim — no cross-device cumsum;
  * router runs in fp32 (softmax stability), experts in the model's compute
    dtype (bf16 under training);
  * the load-balance and router-z losses are sown into the 'intermediates'
    collection; the train step collects them when MoE is enabled
    (train/step.py) and eval/inference simply never mutate the collection,
    so serving paths are unchanged.

Dropped tokens (expert over capacity) pass through the residual unchanged
(their MoE output is zero) — the standard V-MoE behavior.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import gelu_exact, gelu_tanh, trunc_normal_init


class MoEMlp(nn.Module):
    """Drop-in replacement for ``Mlp`` on (B, N, D) token tensors.

    Parameters
    ----------
    hidden_features : per-expert MLP hidden width (same meaning as Mlp's).
    num_experts     : E, size of the expert bank (leading axis of wi/wo —
                      the expert-parallel sharding axis).
    top_k           : experts per token (1 = Switch, 2 = V-MoE default).
    capacity_factor : C = ceil(top_k * N * capacity_factor / E) slots per
                      expert per image; tokens routed past C are dropped
                      (residual passthrough).
    noise_std       : train-time router logit noise (std, in units of 1/E);
                      uses the 'dropout' rng stream.
    """

    dim: int
    hidden_features: int
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 1.25
    noise_std: float = 0.0
    drop: float = 0.0  # MLP dropout, same placement as Mlp (post-act, post-out)
    act_exact: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, N, D = x.shape
        E = int(self.num_experts)
        K = min(int(self.top_k), E)
        C = max(1, int(math.ceil(K * N * self.capacity_factor / E)))
        act = gelu_exact if self.act_exact else gelu_tanh

        # ---- router (fp32) --------------------------------------------
        router = self.param("router", trunc_normal_init, (D, E))
        logits = jnp.einsum("bnd,de->bne", x.astype(jnp.float32), router.astype(jnp.float32))
        if self.noise_std > 0.0 and not deterministic:
            noise = jax.random.normal(self.make_rng("dropout"), logits.shape)
            logits = logits + noise * (self.noise_std / E)
        probs = jax.nn.softmax(logits, axis=-1)  # (B, N, E)

        gate_vals, expert_idx = jax.lax.top_k(probs, K)  # (B, N, K)
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9
        )
        sel = jax.nn.one_hot(expert_idx, E, dtype=jnp.int32)  # (B, N, K, E)

        # ---- capacity positions ---------------------------------------
        # Priority: all rank-0 choices (in token order) fill expert slots
        # before any rank-1 choice — the V-MoE tie-break. Computed per image
        # row so B stays a pure data-parallel dim.
        selr = sel.transpose(0, 2, 1, 3).reshape(B, K * N, E)
        pos = jnp.cumsum(selr, axis=1) - 1  # slot index where selected
        keep = selr * (pos < C)
        keep_r = keep.reshape(B, K, N, E).transpose(0, 2, 1, 3)  # (B, N, K, E)
        pos_r = pos.reshape(B, K, N, E).transpose(0, 2, 1, 3)

        dispatch = jnp.zeros((B, N, E, C), jnp.float32)
        combine = jnp.zeros((B, N, E, C), jnp.float32)
        for k in range(K):
            kp = keep_r[:, :, k, :].astype(jnp.float32)  # (B, N, E)
            pk = jnp.clip(pos_r[:, :, k, :], 0, C - 1)
            oh = jax.nn.one_hot(pk, C, dtype=jnp.float32) * kp[..., None]
            dispatch = dispatch + oh
            combine = combine + gate_vals[:, :, k, None, None] * oh

        # ---- expert bank (compute dtype; E leads -> EP sharding axis) --
        F = int(self.hidden_features)
        wi = self.param("wi", trunc_normal_init, (E, D, F))
        bi = self.param("bi", nn.initializers.zeros, (E, F))
        wo = self.param("wo", trunc_normal_init, (E, F, D))
        bo = self.param("bo", nn.initializers.zeros, (E, D))

        xe = jnp.einsum(
            "bnec,bnd->ebcd", dispatch.astype(self.dtype), x.astype(self.dtype)
        )  # (E, B, C, D)
        h = jnp.einsum("ebcd,edf->ebcf", xe, wi.astype(self.dtype))
        h = act(h + bi[:, None, None, :].astype(self.dtype))
        if self.drop > 0:
            h = nn.Dropout(self.drop)(h, deterministic=deterministic)
        ye = jnp.einsum("ebcf,efd->ebcd", h, wo.astype(self.dtype))
        ye = ye + bo[:, None, None, :].astype(self.dtype)
        if self.drop > 0:
            ye = nn.Dropout(self.drop)(ye, deterministic=deterministic)
        y = jnp.einsum("bnec,ebcd->bnd", combine.astype(self.dtype), ye)

        # ---- auxiliary losses (fp32, averaged by the train step) -------
        # Switch-style load balance: E * sum_e f_e * P_e where f_e is the
        # fraction of tokens whose TOP-1 choice is e and P_e the mean router
        # prob; 1.0 at uniform routing.
        f = jnp.mean(sel[:, :, 0, :].astype(jnp.float32), axis=(0, 1))  # (E,)
        p_mean = jnp.mean(probs, axis=(0, 1))
        aux = E * jnp.sum(f * p_mean)
        zl = jnp.mean(jnp.square(jax.nn.logsumexp(logits, axis=-1)))
        drop_frac = 1.0 - jnp.sum(keep).astype(jnp.float32) / (B * N * K)
        self.sow("intermediates", "moe_aux_loss", aux)
        self.sow("intermediates", "moe_z_loss", zl)
        self.sow("intermediates", "moe_drop_frac", drop_frac)

        return y.astype(self.dtype)
