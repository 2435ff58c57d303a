"""Tests for fused MoE (reference: tests/test_fuse_moe_pertensor.py,
test_fuse_moe_blockwise.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.ops.moe import (
    count_and_gather,
    fuse_moe_blockwise_fp8,
    fuse_moe_pertensor_fp8,
    reduce,
)
from hpc_ops_tpu.utils.testing import assert_allclose


def np_silu(x):
    return x / (1.0 + np.exp(-x))


def naive_moe(
    x8, gw8, dw8, gscale, dscale, act_scale, topk_ids, topk_scale, rank_ep, shared=None
):
    """fp32 oracle over dequantized fp8 inputs (EP-aware)."""
    s, k = topk_ids.shape
    e_local, i2, h = gw8.shape
    interm = i2 // 2
    x = np.asarray(x8, np.float32)
    gw = np.asarray(gw8, np.float32)
    dw = np.asarray(dw8, np.float32)
    out = np.zeros((s, h), np.float32)
    lo, hi = rank_ep * e_local, (rank_ep + 1) * e_local
    for si in range(s):
        for ki in range(k):
            eg = int(topk_ids[si, ki])
            if not (lo <= eg < hi):
                continue
            el = eg - lo
            gu = (x[si] @ gw[el].T) * gscale[el]
            gu = gu.astype(jnp.bfloat16).astype(np.float32)
            a = np_silu(gu[:interm]).astype(jnp.bfloat16).astype(np.float32)
            prod = (a * gu[interm:]).astype(jnp.bfloat16).astype(np.float32)
            d_in = np.clip(prod * act_scale, -448, 448).astype(jnp.float8_e4m3fn)
            d_in = np.asarray(d_in, np.float32)
            d = (d_in @ dw[el].T) * dscale[el]
            d = d.astype(jnp.bfloat16).astype(np.float32)
            out[si] += d * float(topk_scale[si, ki])
    if shared is not None:
        out += np.asarray(shared, np.float32)
    return out


def test_count_and_gather_and_reduce():
    rng = np.random.RandomState(41)
    s, k, h, e = 16, 2, 64, 4
    x = jnp.asarray(rng.randn(s, h) / 10, jnp.float8_e4m3fn)
    topk_ids = jnp.asarray(rng.randint(0, 2 * e, (s, k)), jnp.int32)  # 2 ranks
    rank_ep = 1

    xg, topk_pos, seqlens, cu, tiles, cu_tiles = count_and_gather(
        x, topk_ids, e, rank_ep
    )
    xg_np = np.asarray(xg, np.float32)
    x_np = np.asarray(x, np.float32)
    ids = np.asarray(topk_ids)
    pos = np.asarray(topk_pos).reshape(s, k)

    n_local = 0
    for si in range(s):
        for ki in range(k):
            eg = ids[si, ki]
            if e <= eg < 2 * e:
                p = pos[si, ki]
                assert p >= 0
                np.testing.assert_array_equal(xg_np[p], x_np[si])
                n_local += 1
            else:
                assert pos[si, ki] == -1
    assert int(cu[-1]) == n_local

    # reduce: gather-weighted sum with -1 drops
    scale = rng.rand(s, k).astype(np.float32)
    down = rng.randn(s * k, h).astype(np.float32)
    got = reduce(
        jnp.asarray(down, jnp.bfloat16),
        jnp.asarray(pos),
        jnp.asarray(scale),
    )
    want = np.zeros((s, h), np.float32)
    for si in range(s):
        for ki in range(k):
            if pos[si, ki] >= 0:
                want[si] += (
                    np.asarray(jnp.asarray(down[pos[si, ki]], jnp.bfloat16), np.float32)
                    * scale[si, ki]
                )
    assert_allclose(np.asarray(got, np.float32), want, atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("impl", ["scatter", "gather"])
@pytest.mark.parametrize("rank_ep,size_ep", [(0, 1), (1, 4)])
@pytest.mark.parametrize("has_shared", [False, True])
def test_fuse_moe_pertensor_fp8(rank_ep, size_ep, has_shared, impl):
    rng = np.random.RandomState(41)
    s, k, h, interm, e_total = 32, 4, 256, 256, 16
    e_local = e_total // size_ep

    topk_ids = np.sort(rng.randint(0, e_total, (s, k)).astype(np.int32), axis=1)
    x8 = jnp.asarray(rng.randn(s, h) / 100, jnp.float8_e4m3fn)
    gw8 = jnp.asarray(rng.randn(e_local, 2 * interm, h), jnp.float8_e4m3fn)
    dw8 = jnp.asarray(rng.randn(e_local, h, interm), jnp.float8_e4m3fn)
    gscale = rng.rand(e_local).astype(np.float32) * 0.02
    dscale = rng.rand(e_local).astype(np.float32) * 0.02
    act_scale = np.array([1.5], np.float32)
    topk_scale = (rng.rand(s, k) / k).astype(np.float32)
    shared = (
        jnp.asarray(rng.randn(s, h), jnp.bfloat16) if has_shared else None
    )

    out = fuse_moe_pertensor_fp8(
        x8,
        gw8,
        dw8,
        jnp.asarray(gscale),
        jnp.asarray(dscale),
        jnp.asarray(act_scale),
        jnp.asarray(topk_ids),
        jnp.asarray(topk_scale),
        rank_ep,
        e_total,
        impl=impl,
    )
    if has_shared:
        out = fuse_moe_pertensor_fp8(
            x8,
            gw8,
            dw8,
            jnp.asarray(gscale),
            jnp.asarray(dscale),
            jnp.asarray(act_scale),
            jnp.asarray(topk_ids),
            jnp.asarray(topk_scale),
            rank_ep,
            e_total,
            shared_output=shared,
            impl=impl,
        )

    want = naive_moe(
        x8, gw8, dw8, gscale, dscale, float(act_scale[0]), topk_ids, topk_scale,
        rank_ep, shared,
    )
    assert_allclose(np.asarray(out, np.float32), want, atol=0.1, rtol=0.08)


def test_fuse_moe_blockwise_fp8():
    rng = np.random.RandomState(3)
    s, k, h, interm, e = 16, 2, 256, 256, 4
    kb_h, kb_i = h // 128, interm // 128

    topk_ids = rng.randint(0, e, (s, k)).astype(np.int32)
    x = (rng.randn(s, h) / 10).astype(np.float32)
    xg = x.reshape(s, kb_h, 128)
    sx = np.abs(xg).max(-1) / 448.0 + 1e-8
    x8 = jnp.asarray(xg / sx[..., None], jnp.float8_e4m3fn).reshape(s, h)

    gw = (rng.randn(e, 2 * interm, h) / np.sqrt(h)).astype(np.float32)
    gwg = gw.reshape(e, 2 * interm // 128, 128, kb_h, 128)
    sgw = np.abs(gwg).max(axis=(2, 4)) / 448.0 + 1e-8
    gw8 = jnp.asarray(
        (gwg / sgw[:, :, None, :, None]).reshape(e, 2 * interm, h), jnp.float8_e4m3fn
    )
    dw = (rng.randn(e, h, interm) / np.sqrt(interm)).astype(np.float32)
    dwg = dw.reshape(e, h // 128, 128, kb_i, 128)
    sdw = np.abs(dwg).max(axis=(2, 4)) / 448.0 + 1e-8
    dw8 = jnp.asarray(
        (dwg / sdw[:, :, None, :, None]).reshape(e, h, interm), jnp.float8_e4m3fn
    )
    topk_scale = (rng.rand(s, k) / k).astype(np.float32)

    out = fuse_moe_blockwise_fp8(
        x8,
        jnp.asarray(sx),
        gw8,
        jnp.asarray(sgw),
        dw8,
        jnp.asarray(sdw),
        jnp.asarray(topk_ids),
        jnp.asarray(topk_scale),
        0,
        e,
    )

    # fp32 oracle on dequantized inputs
    xd = np.asarray(x8, np.float32).reshape(s, kb_h, 128) * sx[..., None]
    xd = xd.reshape(s, h)
    gwd = (
        np.asarray(gw8, np.float32).reshape(e, 2 * interm // 128, 128, kb_h, 128)
        * sgw[:, :, None, :, None]
    ).reshape(e, 2 * interm, h)
    dwd = (
        np.asarray(dw8, np.float32).reshape(e, h // 128, 128, kb_i, 128)
        * sdw[:, :, None, :, None]
    ).reshape(e, h, interm)
    want = np.zeros((s, h), np.float32)
    for si in range(s):
        for ki in range(k):
            el = int(topk_ids[si, ki])
            gu = xd[si] @ gwd[el].T
            a = np_silu(gu[:interm]) * gu[interm:]
            want[si] += (a @ dwd[el].T) * topk_scale[si, ki]

    # two fp8 quantization hops: ~2-3% relative error is expected
    assert_allclose(np.asarray(out, np.float32), want, atol=0.05, rtol=0.08)


def test_fuse_moe_blockwise_int8():
    """INT8 blockwise MoE (native s8 MXU grouped GEMMs) vs the dequantized
    fp32 oracle — same structure as the fp8 test, int8 codes."""
    from hpc_ops_tpu.ops.moe import fuse_moe_blockwise_int8
    from hpc_ops_tpu.ops.quant import blockwise_int8_quant

    rng = np.random.RandomState(5)
    s, k, h, interm, e = 16, 2, 256, 256, 4
    kb_h, kb_i = h // 128, interm // 128

    topk_ids = rng.randint(0, e, (s, k)).astype(np.int32)
    x = (rng.randn(s, h) / 10).astype(np.float32)
    x8, sx = blockwise_int8_quant(jnp.asarray(x))

    def quant_w(wm, kb):
        e_, n_, k_ = wm.shape
        wg = wm.reshape(e_, n_ // 128, 128, kb, 128)
        sw = np.abs(wg).max(axis=(2, 4)) / 127.0 + 1e-8
        w8 = np.clip(np.round(wg / sw[:, :, None, :, None]), -127, 127)
        return jnp.asarray(w8.reshape(e_, n_, k_), jnp.int8), sw

    gw = (rng.randn(e, 2 * interm, h) / np.sqrt(h)).astype(np.float32)
    gw8, sgw = quant_w(gw, kb_h)
    dw = (rng.randn(e, h, interm) / np.sqrt(interm)).astype(np.float32)
    dw8, sdw = quant_w(dw, kb_i)
    topk_scale = (rng.rand(s, k) / k).astype(np.float32)

    out = fuse_moe_blockwise_int8(
        x8,
        sx,
        gw8,
        jnp.asarray(sgw),
        dw8,
        jnp.asarray(sdw),
        jnp.asarray(topk_ids),
        jnp.asarray(topk_scale),
        0,
        e,
    )

    sx_np = np.asarray(sx, np.float32)
    xd = np.asarray(x8, np.float32).reshape(s, kb_h, 128) * sx_np[..., None]
    xd = xd.reshape(s, h)
    gwd = (
        np.asarray(gw8, np.float32).reshape(e, 2 * interm // 128, 128, kb_h, 128)
        * sgw[:, :, None, :, None]
    ).reshape(e, 2 * interm, h)
    dwd = (
        np.asarray(dw8, np.float32).reshape(e, h // 128, 128, kb_i, 128)
        * sdw[:, :, None, :, None]
    ).reshape(e, h, interm)
    want = np.zeros((s, h), np.float32)
    for si in range(s):
        for ki in range(k):
            el = int(topk_ids[si, ki])
            gu = xd[si] @ gwd[el].T
            a = np_silu(gu[:interm]) * gu[interm:]
            want[si] += (a @ dwd[el].T) * topk_scale[si, ki]

    # int8 codes are ~2.8x finer than e4m3 at full range: tighter than fp8
    assert_allclose(np.asarray(out, np.float32), want, atol=0.03, rtol=0.05)


def test_fuse_moe_int8_vs_ref():
    """INT8 fused MoE (native s8 MXU path) matches its own ref pipeline and
    stays close to an fp32 MoE oracle."""
    import numpy as np
    from hpc_ops_tpu.ops.moe import fuse_moe_pertensor_int8
    from hpc_ops_tpu.ops.quant import scaled_int8_quant

    rng = np.random.RandomState(3)
    s, h, i, e, k = 64, 256, 128, 8, 2
    xf = jnp.asarray(rng.randn(s, h), jnp.float32) * 0.3
    gu = jnp.asarray(rng.randn(e, 2 * i, h), jnp.float32) * 0.05
    dw = jnp.asarray(rng.randn(e, h, i), jnp.float32) * 0.05
    topk_ids = jnp.asarray(rng.randint(0, e, (s, k)), jnp.int32)
    topk_scale = jnp.asarray(rng.rand(s, k), jnp.float32)

    x8, xs = scaled_int8_quant(xf)
    gu8s = [scaled_int8_quant(gu[j]) for j in range(e)]
    gu8 = jnp.stack([a for a, _ in gu8s])
    gus = jnp.concatenate([b for _, b in gu8s])
    dw8s = [scaled_int8_quant(dw[j]) for j in range(e)]
    dw8 = jnp.stack([a for a, _ in dw8s])
    dws = jnp.concatenate([b for _, b in dw8s])

    # activation-range multiplier mapping silu(gate)*up onto [-127, 127]
    act_scale = jnp.asarray([127.0 / 0.2], jnp.float32)
    gate_up_scale = xs.reshape(()) * gus  # [E]
    down_scale = dws / act_scale.reshape(())  # undo act quant multiplier

    args = (
        x8, gu8, dw8, gate_up_scale, down_scale, act_scale,
        topk_ids, topk_scale, 0, e,
    )
    out = fuse_moe_pertensor_int8(*args)
    want = fuse_moe_pertensor_int8(*args, impl="ref")
    assert_allclose(
        np.asarray(out, np.float32),
        np.asarray(want, np.float32),
        atol=5e-2,
        rtol=5e-2,
        name="int8_moe_pallas_vs_ref",
    )

    # fp32 oracle: full-precision MoE on the dequantized inputs
    xq = np.asarray(x8, np.float32) * np.asarray(xs)
    guq = np.asarray(gu8, np.float32) * np.asarray(gus)[:, None, None]
    dwq = np.asarray(dw8, np.float32) * np.asarray(dws)[:, None, None]
    acc = np.zeros((s, h), np.float32)
    for si in range(s):
        for kj in range(k):
            ei = int(topk_ids[si, kj])
            gup = guq[ei] @ xq[si]
            a = gup[:i] / (1 + np.exp(-gup[:i])) * gup[i:]
            # int8 requant of the activation (what the pipeline does)
            a = np.clip(np.round(a * float(act_scale[0])), -127, 127) / float(
                act_scale[0]
            )
            acc[si] += float(topk_scale[si, kj]) * (dwq[ei] @ a)
    err = np.abs(np.asarray(out, np.float32) - acc)
    rel = err.max() / (np.abs(acc).max() + 1e-9)
    assert rel < 0.08, f"int8 MoE vs fp32 oracle rel err {rel}"


def test_fuse_moe_int8_fused_act_epilogue():
    """gate_up_interleaved=True (fused silu*up*quant in the gate-up GEMM
    epilogue + aligned down GEMM) matches the unfused scatter pipeline."""
    import numpy as np
    from hpc_ops_tpu.ops.moe import (
        fuse_moe_pertensor_int8,
        interleave_gate_up,
    )
    from hpc_ops_tpu.ops.quant import scaled_int8_quant

    rng = np.random.RandomState(7)
    s, h, i, e, k = 96, 256, 128, 8, 2
    xf = jnp.asarray(rng.randn(s, h), jnp.float32) * 0.3
    gu = jnp.asarray(rng.randn(e, 2 * i, h), jnp.float32) * 0.05
    dw = jnp.asarray(rng.randn(e, h, i), jnp.float32) * 0.05
    topk_ids = jnp.asarray(rng.randint(0, e, (s, k)), jnp.int32)
    topk_scale = jnp.asarray(rng.rand(s, k), jnp.float32)

    x8, xs = scaled_int8_quant(xf)
    gu8s = [scaled_int8_quant(gu[j]) for j in range(e)]
    gu8 = jnp.stack([a for a, _ in gu8s])
    gus = jnp.concatenate([b for _, b in gu8s])
    dw8s = [scaled_int8_quant(dw[j]) for j in range(e)]
    dw8 = jnp.stack([a for a, _ in dw8s])
    dws = jnp.concatenate([b for _, b in dw8s])

    act_scale = jnp.asarray([127.0 / 0.2], jnp.float32)
    gate_up_scale = xs.reshape(()) * gus
    down_scale = dws / act_scale.reshape(())

    base = fuse_moe_pertensor_int8(
        x8, gu8, dw8, gate_up_scale, down_scale, act_scale,
        topk_ids, topk_scale, 0, e,
    )
    fused = fuse_moe_pertensor_int8(
        x8, interleave_gate_up(gu8), dw8, gate_up_scale, down_scale,
        act_scale, topk_ids, topk_scale, 0, e, gate_up_interleaved=True,
    )
    # identical int8 math modulo the epilogue's rounding point: codes can
    # differ by at most 1, i.e. 1/act_scale in activation units
    assert_allclose(
        np.asarray(fused, np.float32),
        np.asarray(base, np.float32),
        atol=2.5 * float(np.abs(np.asarray(dw8)).sum(axis=1).max())
        / float(act_scale[0]) * float(dws.max()),
        rtol=0.05,
        name="int8_moe_fused_act_vs_unfused",
    )

    # EP window: fused path drops off-rank tokens identically
    e_local = e // 2
    base_ep = fuse_moe_pertensor_int8(
        x8, gu8[e_local:], dw8[e_local:], gate_up_scale[e_local:],
        down_scale[e_local:], act_scale, topk_ids, topk_scale, 1, e,
    )
    fused_ep = fuse_moe_pertensor_int8(
        x8, interleave_gate_up(gu8[e_local:]), dw8[e_local:],
        gate_up_scale[e_local:], down_scale[e_local:], act_scale,
        topk_ids, topk_scale, 1, e, gate_up_interleaved=True,
    )
    assert_allclose(
        np.asarray(fused_ep, np.float32),
        np.asarray(base_ep, np.float32),
        atol=0.05,
        rtol=0.05,
        name="int8_moe_fused_act_vs_unfused_ep",
    )


def test_reduce_pallas_vs_ref_nan_rows():
    """The Pallas gather-combine must match the jnp reference and must not
    be poisoned by NaN garbage in rows only referenced by dropped slots."""
    from hpc_ops_tpu.ops import moe

    rng = np.random.RandomState(17)
    rows, s, k, h = 512, 100, 8, 512
    x = rng.randn(rows, h).astype(np.float32)
    x[37] = np.nan  # a row only dropped slots point at
    pos = rng.randint(1, rows, size=(s, k)).astype(np.int32)
    pos[pos == 37] = 11  # keep valid slots off the poisoned rows
    pos[rng.rand(s, k) < 0.3] = -1
    pos[0, 0] = -1
    drop = pos < 0
    pos_nan = np.where(drop, -1, pos)
    # make some dropped slots "point" at the NaN row via the gather-row-0
    # path: the kernel gathers row 0 for them — poison row 0 too and rely
    # on the validity select
    x[0] = np.nan
    sc = rng.rand(s, k).astype(np.float32)

    xj = jnp.asarray(x, jnp.bfloat16)
    want = moe.reduce(
        xj, jnp.asarray(pos_nan), jnp.asarray(sc), impl="ref"
    )
    got = moe.reduce(xj, jnp.asarray(pos_nan), jnp.asarray(sc), impl="auto")
    assert not np.isnan(np.asarray(got, np.float32)).any()
    assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2, name="reduce_pallas",
    )
