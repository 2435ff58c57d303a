"""HuggingFace checkpoint conversion.

The reference is an operator library that plugs into vLLM/SGLang, which
load HF checkpoints; a standalone framework needs its own loader. This
module converts a ``transformers`` Llama-family causal-LM (Llama 2/3,
Mistral, Qwen2-style: GQA decoder, NeoX rotate-half RoPE, RMSNorm,
SiLU-gated MLP) into this framework's packed weight layout:

  * ``wqkv [H, (Hq+2Hkv)*D]`` — q|k|v column blocks (q/k/v_proj transposed
    and concatenated; see :func:`repack_qkv_for_tp` for the TP repack)
  * ``w_gate_up [H, 2I]`` — gate|up halves
  * ``w_down [I, H]``, ``wo [Hq*D, H]``, ``lm_head [H, V]`` — transposed
    from HF's [out, in] convention
  * ``cos_sin`` — rebuilt from rope_theta (same NeoX table both sides)

The conversion is validated end-to-end against the HF forward pass in
tests/test_convert.py (logit parity on a random-init tiny Llama) — an
independent-implementation check of the model semantics.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from hpc_ops_tpu.config import FP8_DTYPE
from hpc_ops_tpu.models.llama import ModelConfig, MoEConfig, quantize_w8
from hpc_ops_tpu.ops.rope import make_cos_sin_cache

__all__ = ["config_from_hf", "from_hf_llama", "from_hf_mixtral"]


def config_from_hf(hf_config, max_position: int | None = None) -> ModelConfig:
    """Map a transformers LlamaConfig-compatible config to ModelConfig."""
    head_dim = getattr(hf_config, "head_dim", None) or (
        hf_config.hidden_size // hf_config.num_attention_heads
    )
    return ModelConfig(
        vocab=hf_config.vocab_size,
        hidden=hf_config.hidden_size,
        layers=hf_config.num_hidden_layers,
        q_heads=hf_config.num_attention_heads,
        kv_heads=getattr(
            hf_config, "num_key_value_heads", hf_config.num_attention_heads
        ),
        head_dim=head_dim,
        intermediate=hf_config.intermediate_size,
        rope_base=float(getattr(hf_config, "rope_theta", 10000.0)),
        norm_eps=hf_config.rms_norm_eps,
        max_position=max_position
        or min(int(hf_config.max_position_embeddings), 8192),
    )


def _quantize_moe(gw, dw, scheme: str):
    """Quantize stacked [E, N, K] fp32 expert weights the way init_weights
    does: per-128x128-block int8 scales or per-tensor fp8."""
    if scheme == "blockwise_int8":

        def q_block(wm):
            e_, n_, k_ = wm.shape
            wg = wm.reshape(e_, n_ // 128, 128, k_ // 128, 128)
            sw = jnp.max(jnp.abs(wg), axis=(2, 4)) / 127.0 + 1e-8
            w8 = jnp.clip(jnp.round(wg / sw[:, :, None, :, None]), -127, 127)
            return w8.reshape(e_, n_, k_).astype(jnp.int8), sw

        (g8, gs), (d8, ds) = q_block(gw), q_block(dw)
        return g8, gs, d8, ds
    e = gw.shape[0]
    gs = jnp.max(jnp.abs(gw)) / 448.0
    ds = jnp.max(jnp.abs(dw)) / 448.0
    return (
        (gw / gs).astype(FP8_DTYPE),
        jnp.full((e,), gs, jnp.float32),
        (dw / ds).astype(FP8_DTYPE),
        jnp.full((e,), ds, jnp.float32),
    )


def from_hf_mixtral(
    model,
    dtype=jnp.bfloat16,
    max_position: int | None = None,
    scheme: str = "pertensor_fp8",
):
    """Convert a transformers ``MixtralForCausalLM`` into the MoE flagship.

    Router semantics are identical by construction: Mixtral's
    softmax-then-topk-renormalize equals this model's topk-then-softmax
    (same k logits feed the same normalized exponentials). Expert weights
    are stacked [E, N, K] (w1|w3 rows -> gate|up halves, w2 as-is) and
    quantized with the model's serving scheme (``pertensor_fp8`` or
    ``blockwise_int8`` — the checkpoint is the fp32/bf16 master, the
    quantized cache is derived exactly as init_weights derives it).
    """
    import torch

    base_cfg = config_from_hf(model.config, max_position=max_position)
    cfg = base_cfg._replace(
        moe=MoEConfig(
            num_experts=model.config.num_local_experts,
            topk=model.config.num_experts_per_tok,
            expert_intermediate=model.config.intermediate_size,
            scheme=scheme,
        )
    )

    def t2f(t: "torch.Tensor") -> jnp.ndarray:
        return jnp.asarray(np.asarray(t.detach().to(torch.float32).cpu()))

    def t2j(t: "torch.Tensor") -> jnp.ndarray:
        return t2f(t).astype(dtype)

    base = model.model if hasattr(model, "model") else model
    layers = []
    for hf_layer in base.layers:
        attn = hf_layer.self_attn
        moe = hf_layer.block_sparse_moe
        gw = jnp.stack(
            [
                jnp.concatenate(
                    [t2f(ex.w1.weight), t2f(ex.w3.weight)], axis=0
                )  # [2F, H] gate|up
                for ex in moe.experts
            ]
        )
        dw = jnp.stack([t2f(ex.w2.weight) for ex in moe.experts])  # [E, H, F]
        g8, gs, d8, ds = _quantize_moe(gw, dw, scheme)
        layers.append(
            {
                "attn_norm": t2j(hf_layer.input_layernorm.weight),
                "wqkv": jnp.concatenate(
                    [
                        t2j(attn.q_proj.weight).T,
                        t2j(attn.k_proj.weight).T,
                        t2j(attn.v_proj.weight).T,
                    ],
                    axis=1,
                ),
                "wo": t2j(attn.o_proj.weight).T,
                "mlp_norm": t2j(hf_layer.post_attention_layernorm.weight),
                "router": t2j(moe.gate.weight).T,  # [H, E]
                "moe_gate_up": g8,
                "moe_gate_up_scale": gs,
                "moe_down": d8,
                "moe_down_scale": ds,
            }
        )

    if getattr(model.config, "tie_word_embeddings", False):
        lm_head_w = base.embed_tokens.weight
    else:
        lm_head_w = model.lm_head.weight
    return cfg, {
        "embed": t2j(base.embed_tokens.weight),
        "layers": layers,
        "final_norm": t2j(base.norm.weight),
        "lm_head": t2j(lm_head_w).T,
        "cos_sin": make_cos_sin_cache(
            cfg.max_position,
            cfg.head_dim,
            cfg.rope_base,
            rope_scaling=getattr(model.config, "rope_scaling", None),
        ),
    }


def from_hf_llama(
    model,
    dtype=jnp.bfloat16,
    max_position: int | None = None,
    dense_int8: bool = False,
):
    """Convert a transformers ``LlamaForCausalLM``-style model.

    Returns ``(cfg, weights)`` ready for :func:`forward_step` /
    :class:`hpc_ops_tpu.runtime.Engine`. Weights are materialized through
    float32 numpy then cast to ``dtype`` (bf16 by default).
    ``dense_int8=True`` additionally quantizes the dense projections to
    the W8A8 serving scheme (per-column int8 weights; see
    :func:`hpc_ops_tpu.models.llama.quantize_w8`).
    """
    import torch

    cfg = config_from_hf(model.config, max_position=max_position)

    def t2j(t: "torch.Tensor") -> jnp.ndarray:
        return jnp.asarray(
            np.asarray(t.detach().to(torch.float32).cpu()), dtype
        )

    base = model.model if hasattr(model, "model") else model
    has_bias = base.layers[0].self_attn.q_proj.bias is not None
    cfg = cfg._replace(qkv_bias=has_bias, dense_int8=dense_int8)
    layers = []
    for hf_layer in base.layers:
        attn = hf_layer.self_attn
        mlp = hf_layer.mlp
        wqkv = jnp.concatenate(
            [
                t2j(attn.q_proj.weight).T,
                t2j(attn.k_proj.weight).T,
                t2j(attn.v_proj.weight).T,
            ],
            axis=1,
        )  # [H, (Hq+2Hkv)*D]
        layer = {
            "attn_norm": t2j(hf_layer.input_layernorm.weight),
            "wqkv": wqkv,
            "wo": t2j(attn.o_proj.weight).T,  # [Hq*D, H]
            "mlp_norm": t2j(hf_layer.post_attention_layernorm.weight),
            "w_gate_up": jnp.concatenate(
                [t2j(mlp.gate_proj.weight).T, t2j(mlp.up_proj.weight).T],
                axis=1,
            ),  # [H, 2I]
            "w_down": t2j(mlp.down_proj.weight).T,  # [I, H]
        }
        if has_bias:
            layer["qkv_bias"] = jnp.concatenate(
                [
                    t2j(attn.q_proj.bias),
                    t2j(attn.k_proj.bias),
                    t2j(attn.v_proj.bias),
                ]
            )  # same q|k|v column order as wqkv
        if dense_int8:
            for name in ("wqkv", "wo", "w_gate_up", "w_down"):
                layer[name], layer[name + "_scale"] = quantize_w8(layer[name])
        layers.append(layer)

    if getattr(model.config, "tie_word_embeddings", False):
        lm_head_w = base.embed_tokens.weight
    else:
        lm_head_w = model.lm_head.weight
    weights = {
        "embed": t2j(base.embed_tokens.weight),  # [V, H]
        "layers": layers,
        "final_norm": t2j(base.norm.weight),
        "lm_head": t2j(lm_head_w).T,  # [H, V]
        "cos_sin": make_cos_sin_cache(
            cfg.max_position,
            cfg.head_dim,
            cfg.rope_base,
            rope_scaling=getattr(model.config, "rope_scaling", None),
        ),
    }
    return cfg, weights
