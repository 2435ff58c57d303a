"""End-to-end model tests: prefill + decode consistency on the flagship
decoder (dense and MoE), single-device and TP/EP-sharded over the host mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hpc_ops_tpu.models.llama import (
    forward_step,
    init_cache,
    init_weights,
    make_sharded_step,
    shard_weights_for_tp,
    tiny_config,
)
from hpc_ops_tpu.parallel import make_mesh
from hpc_ops_tpu.utils.common import set_interpret_override
from hpc_ops_tpu.utils.testing import assert_allclose


def run_prefill_then_decode(cfg, seed=0):
    """Prefill 7 tokens for 2 requests, then decode 1 token; return logits."""
    key = jax.random.PRNGKey(seed)
    weights = init_weights(key, cfg)
    bs = 16
    caches = init_cache(cfg, num_blocks=8, block_size=bs)

    q_lens = [7, 5]
    b = len(q_lens)
    rows = sum(q_lens)
    token_ids = jnp.asarray(np.arange(rows) % cfg.vocab, jnp.int32)
    seq_lens = jnp.asarray(q_lens, jnp.int32)
    q_index = jnp.asarray([0, 7, 12], jnp.int32)
    block_ids = jnp.asarray([[0, 1, -1], [2, 3, -1]], jnp.int32)

    logits_p, caches = forward_step(
        weights, caches, cfg, token_ids, seq_lens, q_index, block_ids,
        is_prefill=True, max_seqlens_q=8,
    )

    # decode one token per request
    new_tok = jnp.asarray([3, 5], jnp.int32)
    seq_lens2 = seq_lens + 1
    q_index2 = jnp.asarray([0, 1, 2], jnp.int32)
    logits_d, caches = forward_step(
        weights, caches, cfg, new_tok, seq_lens2, q_index2, block_ids,
        is_prefill=False, max_seqlens_q=1,
    )
    return logits_p, logits_d, caches


@pytest.mark.parametrize("fp8_kv", [False, True])
def test_dense_model_forward(fp8_kv):
    cfg = tiny_config(fp8_kv=fp8_kv)
    logits_p, logits_d, caches = run_prefill_then_decode(cfg)
    assert logits_p.shape == (2, cfg.vocab)
    assert logits_d.shape == (2, cfg.vocab)
    assert np.isfinite(np.asarray(logits_d, np.float32)).all()
    # prefill-then-decode must differ from prefill logits (cache grew)
    assert not np.allclose(
        np.asarray(logits_p, np.float32), np.asarray(logits_d, np.float32)
    )


def test_moe_model_forward():
    cfg = tiny_config(moe=True)
    logits_p, logits_d, _ = run_prefill_then_decode(cfg)
    assert np.isfinite(np.asarray(logits_d, np.float32)).all()


def test_moe_model_blockwise_int8():
    """MoE scheme="blockwise_int8": same random weights quantized per
    128x128 block to int8 must track the pertensor-fp8 model closely
    (finer scale granularity, comparable code width)."""
    from hpc_ops_tpu.models.llama import MoEConfig

    cfg_pt = tiny_config(moe=True)
    cfg_bw = cfg_pt._replace(
        moe=cfg_pt.moe._replace(scheme="blockwise_int8")
    )
    outs = {}
    for name, cfg in (("pt", cfg_pt), ("bw", cfg_bw)):
        logits_p, logits_d, _ = run_prefill_then_decode(cfg, seed=4)
        outs[name] = (
            np.asarray(logits_p, np.float32), np.asarray(logits_d, np.float32)
        )
        assert np.isfinite(outs[name][1]).all()
    for phase, (a, ref) in enumerate(zip(outs["bw"], outs["pt"])):
        num = (a * ref).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(ref, axis=-1)
        cos = num / np.maximum(den, 1e-9)
        assert cos.min() > 0.97, f"phase {phase}: min cosine {cos.min()}"


def test_moe_model_pertensor_int8():
    """MoE scheme="pertensor_int8" (interleaved gate-up + fused act
    epilogue, the serving fast path) must track the pertensor-fp8 model."""
    cfg_pt = tiny_config(moe=True)
    cfg_i8 = cfg_pt._replace(
        moe=cfg_pt.moe._replace(scheme="pertensor_int8")
    )
    outs = {}
    for name, cfg in (("pt", cfg_pt), ("i8", cfg_i8)):
        logits_p, logits_d, _ = run_prefill_then_decode(cfg, seed=4)
        outs[name] = (
            np.asarray(logits_p, np.float32), np.asarray(logits_d, np.float32)
        )
        assert np.isfinite(outs[name][1]).all()
    for phase, (a, ref) in enumerate(zip(outs["i8"], outs["pt"])):
        num = (a * ref).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(ref, axis=-1)
        cos = num / np.maximum(den, 1e-9)
        assert cos.min() > 0.97, f"phase {phase}: min cosine {cos.min()}"


def test_decode_matches_incremental_prefill():
    """Decoding token t+1 after prefill must equal prefilling t+1 tokens."""
    cfg = tiny_config()
    key = jax.random.PRNGKey(1)
    weights = init_weights(key, cfg)
    bs = 16

    toks = np.arange(9) % cfg.vocab
    # full prefill of 9 tokens
    caches_a = init_cache(cfg, 4, bs)
    logits_full, _ = forward_step(
        weights, caches_a, cfg,
        jnp.asarray(toks, jnp.int32), jnp.asarray([9], jnp.int32),
        jnp.asarray([0, 9], jnp.int32), jnp.asarray([[0, 1]], jnp.int32),
        is_prefill=True, max_seqlens_q=9,
    )

    # prefill 8 then decode the 9th
    caches_b = init_cache(cfg, 4, bs)
    _, caches_b = forward_step(
        weights, caches_b, cfg,
        jnp.asarray(toks[:8], jnp.int32), jnp.asarray([8], jnp.int32),
        jnp.asarray([0, 8], jnp.int32), jnp.asarray([[0, 1]], jnp.int32),
        is_prefill=True, max_seqlens_q=8,
    )
    logits_inc, _ = forward_step(
        weights, caches_b, cfg,
        jnp.asarray(toks[8:], jnp.int32), jnp.asarray([9], jnp.int32),
        jnp.asarray([0, 1], jnp.int32), jnp.asarray([[0, 1]], jnp.int32),
        is_prefill=False, max_seqlens_q=1,
    )
    assert_allclose(
        np.asarray(logits_inc, np.float32),
        np.asarray(logits_full, np.float32),
        atol=0.15,
        rtol=0.1,
        name="decode_vs_prefill",
    )


@pytest.mark.parametrize(
    "moe", [False, True, "blockwise_int8", "pertensor_int8"]
)
def test_sharded_step_tp_dp(moe):
    """Full forward step sharded over a 2x4 (dp, tp) host mesh vs single-dev."""
    cpus = jax.devices("cpu")
    if len(cpus) < 8:
        pytest.skip("need 8 host devices")
    set_interpret_override(True)
    try:
        cfg = tiny_config(moe=bool(moe))
        if isinstance(moe, str):
            cfg = cfg._replace(moe=cfg.moe._replace(scheme=moe))
        tp, dp = 4, 2
        mesh = make_mesh(tp=tp, dp=dp, devices=cpus)
        key = jax.random.PRNGKey(7)
        weights = init_weights(key, cfg)
        weights_tp = shard_weights_for_tp(weights, cfg, tp)

        bs = 16
        # one decode token for each of 2 requests per dp shard; each shard
        # owns a local pool of 4 pages, block_ids are shard-local.
        b_total = 2 * dp
        nb_local = 4
        caches = init_cache(cfg, num_blocks=nb_local * dp, block_size=bs)
        token_ids = jnp.asarray(np.arange(b_total) + 1, jnp.int32)
        seq_lens = jnp.ones((b_total,), jnp.int32)
        q_index = jnp.asarray(np.tile([0, 1, 2], dp), jnp.int32)  # per-shard, concatenated
        block_ids_local = np.array([[0, 1], [2, 3]], np.int32)
        block_ids = jnp.asarray(np.tile(block_ids_local, (dp, 1)))

        step = make_sharded_step(mesh, cfg, is_prefill=False, max_seqlens_q=1)
        logits, new_caches = step(
            weights_tp, caches, token_ids, seq_lens, q_index, block_ids
        )
        assert logits.shape == (b_total, cfg.vocab)

        # single-device reference: same requests, globally-distinct pages
        caches_ref = init_cache(cfg, num_blocks=2 * b_total, block_size=bs)
        block_ids_ref = jnp.asarray(
            np.arange(2 * b_total, dtype=np.int32).reshape(b_total, 2)
        )
        want, _ = forward_step(
            weights, caches_ref, cfg, token_ids, seq_lens,
            jnp.asarray([0, 1, 2, 3, 4], jnp.int32), block_ids_ref,
            is_prefill=False, max_seqlens_q=1,
        )
        assert_allclose(
            np.asarray(logits, np.float32), np.asarray(want, np.float32),
            atol=0.3, rtol=0.1, name="sharded_vs_single",
        )
    finally:
        set_interpret_override(None)


def test_dense_model_forward_int8_kv():
    """int8_kv serving mode: fused int8 K|V slab caches end-to-end.

    8 requests so the decode step's row count tiles and rides the fused
    Pallas store kernel (rows=8 -> pick_row_tile hits); logits must stay
    close (cosine) to the bf16-cache model with identical weights.
    """
    cfg_i8 = tiny_config(int8_kv=True, kv_scale=0.02)
    cfg_bf = tiny_config()
    key = jax.random.PRNGKey(2)
    weights = init_weights(key, cfg_bf)
    bs = 16

    q_lens = [7, 5, 3, 8, 2, 6, 4, 1]
    b = len(q_lens)
    rows = sum(q_lens)
    token_ids = jnp.asarray(np.arange(rows) % cfg_bf.vocab, jnp.int32)
    seq_lens = jnp.asarray(q_lens, jnp.int32)
    q_index = jnp.asarray(np.concatenate([[0], np.cumsum(q_lens)]), jnp.int32)
    block_ids = jnp.asarray(
        np.arange(b * 2, dtype=np.int32).reshape(b, 2)
    )

    outs = {}
    for name, cfg in (("i8", cfg_i8), ("bf", cfg_bf)):
        caches = init_cache(cfg, num_blocks=b * 2 + 1, block_size=bs)
        logits_p, caches = forward_step(
            weights, caches, cfg, token_ids, seq_lens, q_index, block_ids,
            is_prefill=True, max_seqlens_q=8,
        )
        new_tok = jnp.asarray(np.arange(b) % cfg.vocab, jnp.int32)
        logits_d, caches = forward_step(
            weights, caches, cfg, new_tok, seq_lens + 1,
            jnp.arange(b + 1, dtype=jnp.int32), block_ids,
            is_prefill=False, max_seqlens_q=1,
        )
        outs[name] = (np.asarray(logits_p, np.float32), np.asarray(logits_d, np.float32))
        if name == "i8":
            assert set(caches[0]) == {"kv"}
            assert caches[0]["kv"].dtype == jnp.int8
            # slot-leading NHD_FUSED slab: [nb, 2*bs, hkv*d]
            assert caches[0]["kv"].shape == (
                b * 2 + 1, 2 * bs, cfg.kv_heads * cfg.head_dim
            )

    for phase, (a, ref) in enumerate(zip(outs["i8"], outs["bf"])):
        assert np.isfinite(a).all()
        num = (a * ref).sum(-1)
        den = np.linalg.norm(a, axis=-1) * np.linalg.norm(ref, axis=-1)
        cos = num / np.maximum(den, 1e-9)
        assert cos.min() > 0.98, f"phase {phase}: min cosine {cos.min()}"


def test_dense_int8_w8a8():
    """ModelConfig(dense_int8=True): W8A8 dense projections track the bf16
    model closely (per-column weight + per-token activation scales; only
    quantization rounding differs) and serve through the Engine."""
    import functools

    from hpc_ops_tpu.models.llama import (
        forward_step, init_cache, init_weights, quantize_w8, tiny_config,
    )
    from hpc_ops_tpu.runtime.engine import Engine

    cfg = tiny_config()
    w = init_weights(jax.random.PRNGKey(4), cfg)
    cfg8 = tiny_config(dense_int8=True)
    # quantize the SAME weights (init_weights would draw fresh ones)
    w8 = {**w, "layers": []}
    for layer in w["layers"]:
        nl = dict(layer)
        for name in ("wqkv", "wo", "w_gate_up", "w_down"):
            nl[name], nl[name + "_scale"] = quantize_w8(layer[name])
        w8["layers"].append(nl)

    ids = np.random.RandomState(0).randint(0, cfg.vocab, 24).tolist()
    outs = {}
    for tag, c, ww in (("bf16", cfg, w), ("w8a8", cfg8, w8)):
        caches = init_cache(c, num_blocks=8, block_size=16)
        toks = np.zeros(32, np.int32)
        toks[:24] = ids
        logits, _ = jax.jit(
            functools.partial(
                forward_step, cfg=c, is_prefill=True, max_seqlens_q=32,
                return_all_logits=True,
            )
        )(
            ww, caches,
            token_ids=jnp.asarray(toks),
            seq_lens=jnp.asarray([24], jnp.int32),
            q_index=jnp.asarray([0, 24], jnp.int32),
            block_ids=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
        )
        outs[tag] = np.asarray(logits, np.float32)[:24]
    a, b = outs["bf16"], outs["w8a8"]
    cos = (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    )
    assert cos.min() > 0.99, f"cosine min {cos.min()}"

    eng = Engine(cfg8, w8, num_blocks=64, block_size=16, max_batch=2)
    served = eng.run([[1, 2, 3], [5, 6]], max_new=4)
    assert all(len(o) == 4 for o in served)
