"""Ring attention (sequence-parallel exact attention) on the 8-device mesh.

Exactness: the online-softmax ring recurrence must reproduce
sdpa_reference bit-for-tolerance on the gathered arrays, and reverse-mode
AD must flow through scan + ppermute (training path) — no custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from linnaeus_tpu.ops.attention import sdpa_reference
from linnaeus_tpu.ops.ring_attention import ring_attention


def _mesh(model: int) -> Mesh:
    devs = np.asarray(jax.devices()[:model]).reshape(1, model)
    return Mesh(devs, ("data", "model"))


@pytest.mark.parametrize("p_size", [2, 4, 8])
def test_ring_matches_reference(p_size):
    mesh = _mesh(p_size)
    B, H, N, D = 2, 3, 64, 16
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q, k, v = [jax.random.normal(kk, (B, H, N, D), jnp.float32) for kk in ks]

    out = ring_attention(q, k, v, mesh)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_sharded_inputs_and_output_sharding():
    """Pre-sharded inputs stay resident; the output carries the token-dim
    sharding (no implicit gather)."""
    mesh = _mesh(4)
    B, H, N, D = 1, 2, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    sh = NamedSharding(mesh, P(None, None, "model", None))
    q, k, v = [
        jax.device_put(jax.random.normal(kk, (B, H, N, D), jnp.float32), sh)
        for kk in ks
    ]
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    assert out.sharding.is_equivalent_to(sh, out.ndim)
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_ring_gradients_match_reference():
    mesh = _mesh(4)
    B, H, N, D = 1, 2, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q, k, v = [jax.random.normal(kk, (B, H, N, D), jnp.float32) for kk in ks]

    g_ring = jax.grad(
        lambda q, k, v: (ring_attention(q, k, v, mesh) ** 2).sum(),
        argnums=(0, 1, 2),
    )(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: (sdpa_reference(q, k, v) ** 2).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_ring_bf16_inputs():
    mesh = _mesh(2)
    B, H, N, D = 1, 2, 16, 8
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    q, k, v = [jax.random.normal(kk, (B, H, N, D), jnp.bfloat16) for kk in ks]
    out = ring_attention(q, k, v, mesh)
    assert out.dtype == jnp.bfloat16
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_ring_rejects_indivisible_n():
    mesh = _mesh(4)
    x = jnp.zeros((1, 1, 30, 8))
    with pytest.raises(ValueError, match="not divisible"):
        ring_attention(x, x, x, mesh)


def test_ring_padded_n_valid_matches_reference():
    """Real token count that doesn't divide by the ring: pad keys/queries,
    pass n_valid — padded key columns must be excluded from the softmax
    exactly; padded query rows are sliced away by the caller."""
    mesh = _mesh(4)
    B, H, N, D = 1, 2, 29, 8  # pads to 32 on a 4-ring
    ks = jax.random.split(jax.random.PRNGKey(4), 3)
    q, k, v = [jax.random.normal(kk, (B, H, N, D), jnp.float32) for kk in ks]
    pad = 32 - N
    qp, kp, vp = [
        jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) for x in (q, k, v)
    ]
    out = ring_attention(qp, kp, vp, mesh, n_valid=N)[:, :, :N, :]
    ref = sdpa_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    # gradients through the padded path stay exact on the valid region
    def loss_ring(q, k, v):
        qp, kp, vp = [
            jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0))) for x in (q, k, v)
        ]
        o = ring_attention(qp, kp, vp, mesh, n_valid=N)[:, :, :N, :]
        return (o ** 2).sum()

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: (sdpa_reference(q, k, v) ** 2).sum(), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4
        )


def test_mformer_v1_with_ring_mesh_matches_single_device():
    """The full flagship model with ring-attention routing (ring_mesh set)
    produces the same logits as the single-device sdpa path — same params.
    N=27 tokens on a 4-ring exercises the in-model padding (27 -> 28)."""
    from __graft_entry__ import _flagship_model

    mesh = _mesh(4)
    model = _flagship_model(tiny=True)
    images = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 32, 3))
    aux = jax.random.normal(jax.random.PRNGKey(1), (4, 5))
    params = model.init(jax.random.PRNGKey(2), images, aux)["params"]

    out_ref = model.apply({"params": params}, images, aux, deterministic=True)
    ring_model = model.clone(ring_mesh=mesh)
    out_ring = ring_model.apply(
        {"params": params}, images, aux, deterministic=True
    )
    assert out_ref.keys() == out_ring.keys()
    for t in out_ref:
        np.testing.assert_allclose(
            np.asarray(out_ring[t]), np.asarray(out_ref[t]),
            atol=2e-5, rtol=1e-5, err_msg=t,
        )
