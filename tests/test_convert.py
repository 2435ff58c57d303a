"""HF checkpoint conversion: logit parity against transformers' own
forward pass — an independent-implementation check of the whole model
semantics (packed QKV layout, NeoX RoPE, GQA paged attention, RMSNorm,
SiLU MLP, lm_head)."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _cos(a, b):
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    )


def test_hf_llama_logit_parity():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import LlamaConfig, LlamaForCausalLM

    from hpc_ops_tpu.models.convert import from_hf_llama
    from hpc_ops_tpu.models.llama import forward_step, init_cache

    hf_cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=1,  # GQA group 4
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    ids = np.random.RandomState(1).randint(0, 512, (1, 24))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits[0].float().numpy()

    cfg, w = from_hf_llama(model)
    assert cfg.head_dim == 128 and cfg.q_heads == 4 and cfg.kv_heads == 1
    caches = init_cache(cfg, num_blocks=4, block_size=16)
    n, bucket = ids.shape[1], 32
    toks = np.zeros(bucket, np.int32)
    toks[:n] = ids[0]
    logits, _ = jax.jit(
        functools.partial(
            forward_step,
            cfg=cfg,
            is_prefill=True,
            max_seqlens_q=bucket,
            return_all_logits=True,
        )
    )(
        w,
        caches,
        token_ids=jnp.asarray(toks),
        seq_lens=jnp.asarray([n], jnp.int32),
        q_index=jnp.asarray([0, n], jnp.int32),
        block_ids=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
    )
    ours = np.asarray(logits, np.float32)[:n]

    # bf16 model vs fp32 HF: per-position logit rows must align directionally
    # and agree on the argmax nearly everywhere
    c = _cos(ours, hf_logits)
    assert c.min() > 0.99, f"cosine per position: min {c.min()}, {c}"
    top1 = float((ours.argmax(-1) == hf_logits.argmax(-1)).mean())
    assert top1 >= 0.9, f"top-1 agreement {top1}"


def test_hf_llama_serving_roundtrip():
    """Converted weights drive the Engine end-to-end (greedy serving)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import LlamaConfig, LlamaForCausalLM

    from hpc_ops_tpu.models.convert import from_hf_llama
    from hpc_ops_tpu.runtime.engine import Engine

    torch.manual_seed(1)
    model = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=256,
            hidden_size=256,
            intermediate_size=512,
            num_hidden_layers=2,
            num_attention_heads=2,
            num_key_value_heads=1,
            max_position_embeddings=64,
            tie_word_embeddings=True,
        )
    ).eval()
    cfg, w = from_hf_llama(model)
    eng = Engine(cfg, w, num_blocks=16, block_size=16, max_batch=2)
    outs = eng.run([[1, 2, 3], [5, 6]], max_new=4)
    assert all(len(o) == 4 for o in outs)

    # greedy continuation must match HF's own greedy argmax loop
    with torch.no_grad():
        seq = [1, 2, 3]
        for _ in range(4):
            nxt = int(model(torch.tensor([seq])).logits[0, -1].argmax())
            seq.append(nxt)
    assert outs[0] == seq[3:], f"ours {outs[0]} != hf {seq[3:]}"


def test_hf_mixtral_logit_parity():
    """Mixtral conversion drives the fused-MoE path; fp8-quantized experts
    vs HF's fp32 reference bound the comparison (quantization is the
    dominant error term, so thresholds are looser than the dense test)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import MixtralConfig, MixtralForCausalLM

    from hpc_ops_tpu.models.convert import from_hf_mixtral
    from hpc_ops_tpu.models.llama import forward_step, init_cache

    hf_cfg = MixtralConfig(
        vocab_size=512,
        hidden_size=256,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    model = MixtralForCausalLM(hf_cfg).eval()
    ids = np.random.RandomState(2).randint(0, 512, (1, 16))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits[0].float().numpy()

    cfg, w = from_hf_mixtral(model)
    assert cfg.moe is not None and cfg.moe.num_experts == 4
    caches = init_cache(cfg, num_blocks=4, block_size=16)
    n, bucket = ids.shape[1], 16
    toks = np.zeros(bucket, np.int32)
    toks[:n] = ids[0]
    logits, _ = jax.jit(
        functools.partial(
            forward_step,
            cfg=cfg,
            is_prefill=True,
            max_seqlens_q=bucket,
            return_all_logits=True,
        )
    )(
        w,
        caches,
        token_ids=jnp.asarray(toks),
        seq_lens=jnp.asarray([n], jnp.int32),
        q_index=jnp.asarray([0, n], jnp.int32),
        block_ids=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
    )
    ours = np.asarray(logits, np.float32)[:n]
    c = _cos(ours, hf_logits)
    top1 = float((ours.argmax(-1) == hf_logits.argmax(-1)).mean())
    print("mixtral cosine min/mean:", c.min(), c.mean(), "top1:", top1)
    assert c.min() > 0.95, f"cosine per position: min {c.min()}"
    assert top1 >= 0.75, f"top-1 agreement {top1}"


def test_hf_qwen2_logit_parity():
    """Qwen2-style models add QKV projection biases (no other structural
    change vs Llama) — from_hf_llama picks them up and the bias rides the
    packed q|k|v column order."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from hpc_ops_tpu.models.convert import from_hf_llama
    from hpc_ops_tpu.models.llama import forward_step, init_cache

    hf_cfg = Qwen2Config(
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    assert model.model.layers[0].self_attn.q_proj.bias is not None

    ids = np.random.RandomState(4).randint(0, 512, (1, 20))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits[0].float().numpy()

    cfg, w = from_hf_llama(model)
    assert cfg.qkv_bias
    caches = init_cache(cfg, num_blocks=4, block_size=16)
    n, bucket = ids.shape[1], 32
    toks = np.zeros(bucket, np.int32)
    toks[:n] = ids[0]
    logits, _ = jax.jit(
        functools.partial(
            forward_step,
            cfg=cfg,
            is_prefill=True,
            max_seqlens_q=bucket,
            return_all_logits=True,
        )
    )(
        w,
        caches,
        token_ids=jnp.asarray(toks),
        seq_lens=jnp.asarray([n], jnp.int32),
        q_index=jnp.asarray([0, n], jnp.int32),
        block_ids=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
    )
    ours = np.asarray(logits, np.float32)[:n]
    c = _cos(ours, hf_logits)
    top1 = float((ours.argmax(-1) == hf_logits.argmax(-1)).mean())
    assert c.min() > 0.99, f"cosine min {c.min()}"
    assert top1 >= 0.9, f"top-1 {top1}"


def test_hf_llama3_rope_scaling_parity():
    """Llama-3.1-style rope_scaling checkpoints: the converter rebuilds
    the scaled frequency table and logits match HF's own scaled rope."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import LlamaConfig, LlamaForCausalLM

    from hpc_ops_tpu.models.convert import from_hf_llama
    from hpc_ops_tpu.models.llama import forward_step, init_cache

    hf_cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=512,
        intermediate_size=1024,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=1,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 4.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
        tie_word_embeddings=False,
    )
    torch.manual_seed(9)
    model = LlamaForCausalLM(hf_cfg).eval()
    # long enough that scaled vs unscaled rope visibly diverges
    ids = np.random.RandomState(6).randint(0, 512, (1, 48))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits[0].float().numpy()

    cfg, w = from_hf_llama(model, max_position=256)
    caches = init_cache(cfg, num_blocks=8, block_size=16)
    n, bucket = ids.shape[1], 64
    toks = np.zeros(bucket, np.int32)
    toks[:n] = ids[0]
    logits, _ = jax.jit(
        functools.partial(
            forward_step,
            cfg=cfg,
            is_prefill=True,
            max_seqlens_q=bucket,
            return_all_logits=True,
        )
    )(
        w,
        caches,
        token_ids=jnp.asarray(toks),
        seq_lens=jnp.asarray([n], jnp.int32),
        q_index=jnp.asarray([0, n], jnp.int32),
        block_ids=jnp.asarray([[0, 1, 2, 3, 4, 5, 6, 7]], jnp.int32),
    )
    ours = np.asarray(logits, np.float32)[:n]
    c = _cos(ours, hf_logits)
    top1 = float((ours.argmax(-1) == hf_logits.argmax(-1)).mean())
    assert c.min() > 0.99, f"cosine min {c.min()}"
    assert top1 >= 0.9, f"top-1 {top1}"


def test_hf_llama_dense_int8_parity():
    """from_hf_llama(dense_int8=True): W8A8 dense projections track the HF
    fp32 forward (quantization rounding is the only extra error term)."""
    torch = pytest.importorskip("torch")
    pytest.importorskip("transformers")
    from transformers import LlamaConfig, LlamaForCausalLM

    from hpc_ops_tpu.models.convert import from_hf_llama
    from hpc_ops_tpu.models.llama import forward_step, init_cache

    torch.manual_seed(0)
    model = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=512,
            hidden_size=512,
            intermediate_size=1024,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=1,
            max_position_embeddings=128,
            tie_word_embeddings=False,
        )
    ).eval()
    ids = np.random.RandomState(1).randint(0, 512, (1, 24))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits[0].float().numpy()

    cfg, w = from_hf_llama(model, dense_int8=True)
    assert cfg.dense_int8 and w["layers"][0]["wqkv"].dtype == jnp.int8
    caches = init_cache(cfg, num_blocks=4, block_size=16)
    n, bucket = ids.shape[1], 32
    toks = np.zeros(bucket, np.int32)
    toks[:n] = ids[0]
    logits, _ = jax.jit(
        functools.partial(
            forward_step, cfg=cfg, is_prefill=True, max_seqlens_q=bucket,
            return_all_logits=True,
        )
    )(
        w, caches,
        token_ids=jnp.asarray(toks),
        seq_lens=jnp.asarray([n], jnp.int32),
        q_index=jnp.asarray([0, n], jnp.int32),
        block_ids=jnp.asarray([[0, 1, 2, 3]], jnp.int32),
    )
    ours = np.asarray(logits, np.float32)[:n]
    c = _cos(ours, hf_logits)
    assert c.min() > 0.98, f"cosine min {c.min()}"
