"""Ring attention (sequence parallel over the mesh ring) vs a dense
single-device oracle, on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _cpu_devices(n):
    cpus = jax.devices("cpu")
    if len(cpus) < n:
        pytest.skip(f"need {n} virtual CPU devices")
    return cpus[:n]


def np_attention(q, k, v, causal, group):
    b, s, hq, d = q.shape
    out = np.zeros_like(q, dtype=np.float32)
    for h in range(hq):
        kh = h // group
        sc = (q[:, :, h].astype(np.float64) @ k[:, :, kh].astype(np.float64).transpose(0, 2, 1)) / np.sqrt(d)
        if causal:
            mask = np.tril(np.ones((s, s), bool))
            sc = np.where(mask, sc, -np.inf)
        w = np.exp(sc - sc.max(-1, keepdims=True))
        w = w / w.sum(-1, keepdims=True)
        out[:, :, h] = (w @ v[:, :, kh].astype(np.float64)).astype(np.float32)
    return out


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("ws", [4, 8])
def test_ring_attention_matches_dense(causal, ws):
    from hpc_ops_tpu.parallel.ring_attention import ring_attention

    devices = _cpu_devices(ws)
    b, s_loc, hkv, group, d = 2, 8, 2, 2, 64
    hq = hkv * group
    s = ws * s_loc
    rng = np.random.RandomState(7)
    q = rng.randn(b, s, hq, d).astype(np.float32)
    k = rng.randn(b, s, hkv, d).astype(np.float32)
    v = rng.randn(b, s, hkv, d).astype(np.float32)

    want = np_attention(q, k, v, causal, group)

    mesh = Mesh(np.array(devices), ("sp",))
    f = jax.jit(
        jax.shard_map(
            lambda q_, k_, v_: ring_attention(
                q_, k_, v_, "sp", causal=causal
            ),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
        )
    )
    got = np.asarray(
        f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)), np.float32
    )
    err = np.abs(got - want).max()
    assert err < 2e-4, f"max err {err}"


@pytest.mark.parametrize("ws", [4, 8])
def test_ring_attention_zigzag_matches_dense(ws):
    """Zigzag-balanced causal schedule: layout-permute in, compute, inverse
    permute out — must equal dense causal attention."""
    from hpc_ops_tpu.parallel.ring_attention import (
        ring_attention,
        zigzag_layout,
        zigzag_unlayout,
    )

    devices = _cpu_devices(ws)
    b, hkv, group, d = 2, 2, 2, 64
    hq = hkv * group
    s = ws * 2 * 4  # 2p blocks of 4
    rng = np.random.RandomState(3)
    q = rng.randn(b, s, hq, d).astype(np.float32)
    k = rng.randn(b, s, hkv, d).astype(np.float32)
    v = rng.randn(b, s, hkv, d).astype(np.float32)
    want = np_attention(q, k, v, True, group)

    mesh = Mesh(np.array(devices), ("sp",))
    f = jax.jit(
        jax.shard_map(
            lambda q_, k_, v_: ring_attention(
                q_, k_, v_, "sp", causal=True, schedule="zigzag"
            ),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
            out_specs=P(None, "sp"),
        )
    )
    qz = zigzag_layout(jnp.asarray(q), ws)
    kz = zigzag_layout(jnp.asarray(k), ws)
    vz = zigzag_layout(jnp.asarray(v), ws)
    got = np.asarray(
        zigzag_unlayout(f(qz, kz, vz), ws), np.float32
    )
    err = np.abs(got - want).max()
    assert err < 2e-4, f"max err {err}"


def test_zigzag_layout_roundtrip():
    from hpc_ops_tpu.parallel.ring_attention import (
        zigzag_layout,
        zigzag_unlayout,
    )

    x = jnp.arange(48).reshape(1, 48, 1)
    y = zigzag_unlayout(zigzag_layout(x, 4), 4)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
