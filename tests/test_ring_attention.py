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
