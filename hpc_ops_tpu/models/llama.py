"""Flagship decoder models built on the hpc_ops_tpu operator stack.

Dense Llama-class and MoE (Mixtral/DeepSeek-class) decoders exercising the
full serving path the reference targets (README.md:36-38 "designed to plug
into vLLM/SGLang"): fused RoPE+KV-store into a paged cache (BF16 or FP8),
paged decode/prefill attention kernels, fused-MoE, and the fused
AllReduce+Residual+RMSNorm as the TP glue.

Parallelism: a (dp, tp) mesh. Q/KV heads and MLP intermediate are sharded on
``tp`` (GQA co-located so attention needs zero communication); MoE experts
are expert-parallel on the same axis (rank_ep = tp index, matching the
reference's EP deployment shape, hpc/fuse_moe.py:41-44). Row-parallel
projections end in the fused collective-norm, which is the only cross-chip
communication per layer. ``dp`` shards the batch.

Caches live natively in the HND page layout ([H_kv, blocks, block_size, D])
so the attention kernels DMA whole (head, page) slabs; the int8 serving mode
uses the slot-leading NHD_FUSED slab ([blocks, 2*bs, H_kv*D]) so one DMA per
page covers all heads and the fused Pallas store is legal on compiled TPU.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from hpc_ops_tpu.config import FP8_DTYPE, QuantPolicy
from hpc_ops_tpu.ops.attention.decode import attention_decode
from hpc_ops_tpu.ops.attention.prefill import attention_with_kvcache_prefill
from hpc_ops_tpu.ops.moe import fuse_moe_pertensor_fp8
from hpc_ops_tpu.ops.normalization import rmsnorm_ref
from hpc_ops_tpu.ops.rope import (
    make_cos_sin_cache,
    rope_norm_store_kv,
    rope_norm_store_kv_fp8,
    rope_norm_store_kv_int8,
)
from hpc_ops_tpu.ops.sampler import (
    fused_sampler_temperature_sample,
    gumbel_from_uniform,
)
from hpc_ops_tpu.parallel.collectives import fuse_allreduce_rmsnorm


class MoEConfig(NamedTuple):
    num_experts: int = 8
    topk: int = 2
    expert_intermediate: int = 1024
    # "pertensor_fp8": one scale per expert weight, fp8 codes (reference
    # default, hpc/fuse_moe.py:136). "blockwise_int8": per-128x128-block
    # weight scales + per-(row,128-group) activation scales with int8
    # codes — the deepseek-class fine-grained scheme on the MXU's native
    # s8 path (requires hidden and 2*expert_intermediate % 128 == 0).
    # "pertensor_int8": per-expert int8 weights with the gate-up weight
    # stored INTERLEAVED (interleave_gate_up) so the gate-up GEMM fuses
    # silu*up*quant into its epilogue and the down GEMM runs the aligned
    # block-DMA path — the TPU serving fast path (no bf16 intermediate,
    # no separate activation launch, no row gather in the down GEMM).
    scheme: str = "pertensor_fp8"
    # pertensor_int8 only: |silu(gate)*up| clip range mapped onto int8
    # (codes saturate beyond it; recalibrate per checkpoint if needed)
    act_clip: float = 8.0


class ModelConfig(NamedTuple):
    vocab: int = 32000
    hidden: int = 4096
    layers: int = 32
    q_heads: int = 32
    kv_heads: int = 8
    head_dim: int = 128
    intermediate: int = 14336
    rope_base: float = 500000.0
    norm_eps: float = 1e-5
    fp8_kv: bool = False
    # int8_kv: the TPU-native quantized serving mode — KV pages hold
    # symmetric int8 codes in the slot-leading fused K|V layout
    # (pack_kv_fused_nhd, NHD_FUSED) with one static per-tensor scale each;
    # decode rides the NHD-fused int8 Pallas kernel (one descriptor per
    # page for all heads) and stores run the fused Pallas RoPE+quant+store.
    # Mutually exclusive with fp8_kv.
    int8_kv: bool = False
    kv_scale: float = 0.05  # static per-tensor K/V scale for int8_kv
    qkv_bias: bool = False  # Qwen2-style attention-projection bias
    # dense_int8: W8A8 serving for the dense projections (wqkv, wo,
    # gate_up, down) — int8 weights with per-output-column scales,
    # per-token dynamic activation scales, s8xs8->s32 on the MXU (v5e:
    # 265 vs 186 TFLOP/s AND half the weight-streaming bytes, the
    # binding resource of small-batch dense decode). lm_head stays bf16.
    dense_int8: bool = False
    moe: Optional[MoEConfig] = None
    max_position: int = 8192
    # residual-branch gain. 1.0 = raw random-init behavior; trained nets
    # keep the residual stream dominant — 1/sqrt(2*layers) (muP-style
    # depth scaling) reproduces that signal propagation and is the
    # "realistic" configuration of the fp8-accuracy bench.
    residual_alpha: float = 1.0

    @property
    def qkv_out(self) -> int:
        return (self.q_heads + 2 * self.kv_heads) * self.head_dim


def llama3_8b(**kw) -> ModelConfig:
    return ModelConfig(
        vocab=128256, hidden=4096, layers=32, q_heads=32, kv_heads=8,
        head_dim=128, intermediate=14336, **kw,
    )


def tiny_config(moe: bool = False, **kw) -> ModelConfig:
    """Small config for tests / dry runs."""
    return ModelConfig(
        vocab=512,
        hidden=256,
        layers=2,
        q_heads=8,
        kv_heads=4,
        head_dim=128,
        intermediate=512,
        max_position=512,
        moe=MoEConfig(num_experts=8, topk=2, expert_intermediate=256) if moe else None,
        **kw,
    )


def init_weights(key, cfg: ModelConfig, dtype=jnp.bfloat16) -> dict:
    """Random-initialized weight pytree (layout documented inline)."""
    keys = jax.random.split(key, cfg.layers + 2)
    h, d = cfg.hidden, cfg.head_dim

    def lin(k, fan_in, shape):
        return (jax.random.normal(k, shape, jnp.float32) / math.sqrt(fan_in)).astype(
            dtype
        )

    layers = []
    for i in range(cfg.layers):
        ks = jax.random.split(keys[i], 8)
        layer: dict[str, Any] = {
            "attn_norm": jnp.ones((h,), jnp.float32),
            "wqkv": lin(ks[0], h, (h, cfg.qkv_out)),
            "wo": lin(ks[1], cfg.q_heads * d, (cfg.q_heads * d, h)),
            "mlp_norm": jnp.ones((h,), jnp.float32),
        }
        if cfg.moe is None:
            layer["w_gate_up"] = lin(ks[2], h, (h, 2 * cfg.intermediate))
            layer["w_down"] = lin(ks[3], cfg.intermediate, (cfg.intermediate, h))
        else:
            m = cfg.moe
            layer["router"] = lin(ks[4], h, (h, m.num_experts))
            gw = jax.random.normal(
                ks[5], (m.num_experts, 2 * m.expert_intermediate, h), jnp.float32
            ) / math.sqrt(h)
            dw = jax.random.normal(
                ks[6], (m.num_experts, h, m.expert_intermediate), jnp.float32
            ) / math.sqrt(m.expert_intermediate)
            if m.scheme == "blockwise_int8":

                def q_block(wm):
                    e_, n_, k_ = wm.shape
                    wg = wm.reshape(e_, n_ // 128, 128, k_ // 128, 128)
                    sw = jnp.max(jnp.abs(wg), axis=(2, 4)) / 127.0 + 1e-8
                    w8 = jnp.clip(
                        jnp.round(wg / sw[:, :, None, :, None]), -127, 127
                    )
                    return w8.reshape(e_, n_, k_).astype(jnp.int8), sw

                layer["moe_gate_up"], layer["moe_gate_up_scale"] = q_block(gw)
                layer["moe_down"], layer["moe_down_scale"] = q_block(dw)
            elif m.scheme == "pertensor_int8":
                from hpc_ops_tpu.ops.moe import interleave_gate_up

                def q_pt(wm):
                    s = jnp.max(jnp.abs(wm), axis=(1, 2)) / 127.0 + 1e-12
                    w8 = jnp.clip(
                        jnp.round(wm / s[:, None, None]), -127, 127
                    ).astype(jnp.int8)
                    return w8, s

                g8, gs8 = q_pt(gw)
                d8, ds8 = q_pt(dw)
                act_scale = jnp.asarray([127.0 / m.act_clip], jnp.float32)
                layer["moe_gate_up"] = interleave_gate_up(g8)
                layer["moe_gate_up_scale"] = gs8
                layer["moe_down"] = d8
                # fold the activation dequant into the down-GEMM scale
                layer["moe_down_scale"] = ds8 / act_scale[0]
                layer["moe_act_scale"] = act_scale
            else:
                gs = jnp.max(jnp.abs(gw)) / 448.0
                ds = jnp.max(jnp.abs(dw)) / 448.0
                layer["moe_gate_up"] = (gw / gs).astype(FP8_DTYPE)
                layer["moe_down"] = (dw / ds).astype(FP8_DTYPE)
                layer["moe_gate_up_scale"] = jnp.full(
                    (m.num_experts,), gs, jnp.float32
                )
                layer["moe_down_scale"] = jnp.full(
                    (m.num_experts,), ds, jnp.float32
                )
        if cfg.dense_int8:
            for name in ("wqkv", "wo") + (
                ("w_gate_up", "w_down") if cfg.moe is None else ()
            ):
                layer[name], layer[name + "_scale"] = quantize_w8(layer[name])
        layers.append(layer)
    return {
        "embed": lin(keys[-2], 1, (cfg.vocab, h)),
        "final_norm": jnp.ones((h,), jnp.float32),
        "lm_head": lin(keys[-1], h, (h, cfg.vocab)),
        "layers": layers,
        "cos_sin": make_cos_sin_cache(cfg.max_position, d, cfg.rope_base),
    }


def quantize_w8(w: jax.Array):
    """Per-output-column symmetric int8 weight quantization:
    w[:, c] ~= w8[:, c] * scale[c]. Returns (int8 codes, f32 scales)."""
    wf = w.astype(jnp.float32)
    scale = jnp.max(jnp.abs(wf), axis=0) / 127.0 + 1e-9
    w8 = jnp.clip(jnp.round(wf / scale[None, :]), -127, 127).astype(jnp.int8)
    return w8, scale


def _mm_w8a8(x, w8, w_scale):
    """W8A8 matmul: per-token dynamic activation scales, s8 MXU dot,
    f32 rescale -> bf16. Exactness of the int32 accumulate makes the only
    error the two quantization roundings."""
    xf = x.astype(jnp.float32)
    xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0 + 1e-9
    x8 = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x8, w8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * xs * w_scale[None, :]).astype(
        jnp.bfloat16
    )


def _mm(x, layer, name):
    """Dense projection: bf16 matmul, or W8A8 when the weight is int8."""
    w = layer[name]
    if w.dtype == jnp.int8:
        return _mm_w8a8(x, w, layer[name + "_scale"])
    return x @ w


def init_cache(cfg: ModelConfig, num_blocks: int, block_size: int, tp: int = 1):
    """Paged caches per layer: HND [Hkv/tp, blocks, bs, D] k/v pairs, or a
    single slot-leading fused int8 slab [blocks, 2*bs, (Hkv/tp)*D]
    (NHD_FUSED) when cfg.int8_kv."""
    hkv = cfg.kv_heads // tp
    if cfg.int8_kv:
        return [
            {
                "kv": jnp.zeros(
                    (num_blocks, 2 * block_size, hkv * cfg.head_dim), jnp.int8
                )
            }
            for _ in range(cfg.layers)
        ]
    dt = FP8_DTYPE if cfg.fp8_kv else jnp.bfloat16
    return [
        {
            "k": jnp.zeros((hkv, num_blocks, block_size, cfg.head_dim), dt),
            "v": jnp.zeros((hkv, num_blocks, block_size, cfg.head_dim), dt),
        }
        for _ in range(cfg.layers)
    ]


def _mlp_dense(h_normed, layer):
    gu = _mm(h_normed, layer, "w_gate_up")
    i = gu.shape[-1] // 2
    gate = gu[..., :i].astype(jnp.float32)
    act = (gate * jax.nn.sigmoid(gate)).astype(jnp.bfloat16) * gu[..., i:]
    return _mm(act, layer, "w_down")  # partial over tp (w_down row-sharded)


def _mlp_moe(h_normed, layer, cfg: ModelConfig, rank_ep):
    m = cfg.moe
    router_logits = h_normed.astype(jnp.float32) @ layer["router"].astype(jnp.float32)
    topk_scale, topk_ids = jax.lax.top_k(router_logits, m.topk)
    topk_scale = jax.nn.softmax(topk_scale, axis=-1)
    if m.scheme == "pertensor_int8":
        from hpc_ops_tpu.ops.moe import fuse_moe_pertensor_int8

        xf = h_normed.astype(jnp.float32)
        x_amax = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-6)
        x_scale = x_amax / 127.0
        x8 = jnp.clip(jnp.round(xf / x_scale), -127, 127).astype(jnp.int8)
        return fuse_moe_pertensor_int8(
            x8,
            layer["moe_gate_up"],
            layer["moe_down"],
            layer["moe_gate_up_scale"] * x_scale,
            layer["moe_down_scale"],
            layer["moe_act_scale"],
            topk_ids.astype(jnp.int32),
            topk_scale,
            rank_ep,
            m.num_experts,
            gate_up_interleaved=True,
        )
    if m.scheme == "blockwise_int8":
        from hpc_ops_tpu.ops.moe import fuse_moe_blockwise_int8
        from hpc_ops_tpu.ops.quant import blockwise_int8_quant

        x8, sx = blockwise_int8_quant(h_normed.astype(jnp.float32))
        return fuse_moe_blockwise_int8(
            x8,
            sx,
            layer["moe_gate_up"],
            layer["moe_gate_up_scale"],
            layer["moe_down"],
            layer["moe_down_scale"],
            topk_ids.astype(jnp.int32),
            topk_scale,
            rank_ep,
            m.num_experts,
        )
    # quantize activations per-tensor for the fp8 MoE
    x_amax = jnp.maximum(jnp.max(jnp.abs(h_normed.astype(jnp.float32))), 1e-6)
    x_scale = x_amax / 448.0
    x8 = (h_normed.astype(jnp.float32) / x_scale).astype(FP8_DTYPE)
    out = fuse_moe_pertensor_fp8(
        x8,
        layer["moe_gate_up"],
        layer["moe_down"],
        layer["moe_gate_up_scale"] * x_scale,  # fold activation scale
        layer["moe_down_scale"],
        jnp.ones((1,), jnp.float32),
        topk_ids.astype(jnp.int32),
        topk_scale,
        rank_ep,
        m.num_experts,
    )
    return out  # partial over tp/ep ranks (off-rank experts dropped)


def forward_step(
    weights,
    caches,
    cfg: ModelConfig,
    token_ids: jax.Array,  # [B*Sq] int32 (new tokens, packed)
    seq_lens: jax.Array,  # [B] total tokens incl. new
    q_index: jax.Array,  # [B+1] prefix sums of new tokens per request
    block_ids: jax.Array,  # [B, max_blocks]
    is_prefill: bool,
    mtp: int = 0,
    axis_name: Optional[str] = None,
    rank_ep: int = 0,
    max_seqlens_q: int = 1,
    temperature: float = 0.0,
    sample_seed: int = 0,
    return_all_logits: bool = False,
):
    """One forward step (prefill or decode) over the paged caches.

    Returns (sampled_or_logits, new_caches): greedy/temp-sampled token ids
    [B, 1] when temperature > 0 else raw logits of the last token per request.
    With ``return_all_logits`` (speculative-decode verification), raw logits
    for EVERY input row [rows, vocab] instead.
    """
    rows = token_ids.shape[0]
    b = seq_lens.shape[0]
    h = cfg.hidden
    x = weights["embed"][token_ids]  # [rows, H] bf16

    h_normed = rmsnorm_ref(x, weights["layers"][0]["attn_norm"], cfg.norm_eps).astype(
        jnp.bfloat16
    )
    x_res = x.astype(jnp.bfloat16)
    new_caches = []

    kv_sc = jnp.full((1,), cfg.kv_scale, jnp.float32)
    for li, layer in enumerate(weights["layers"]):
        qkv = _mm(h_normed, layer, "wqkv")  # [rows, (Hq+2Hkv)/tp * D]
        if "qkv_bias" in layer:  # Qwen2-style attention bias
            qkv = qkv + layer["qkv_bias"].astype(qkv.dtype)
        if cfg.int8_kv:
            # quantized serving mode: one slot-leading fused int8 K|V slab
            # per layer (NHD_FUSED, [nb, 2*bs, Hkv*D]). Decode stores run
            # the fused Pallas RoPE+quant+store kernel (legal on compiled
            # TPU only in slot-leading layouts) and decode reads move ONE
            # DMA descriptor per page for all heads.
            hkv_shard = caches[li]["kv"].shape[2] // cfg.head_dim
            q, kv_new = rope_norm_store_kv_int8(
                caches[li]["kv"],
                qkv,
                weights["cos_sin"],
                seq_lens,
                q_index,
                block_ids,
                is_prefill,
                kv_sc,
                kv_sc,
                impl="xla" if is_prefill else "pallas",
                cache_layout="NHD_FUSED",
                num_kv_heads=hkv_shard,
            )
            new_caches.append({"kv": kv_new})
            if is_prefill:
                # all-heads prefill reads the fused slab in place — no
                # O(cache) unpack per chunk per layer
                attn = attention_with_kvcache_prefill(
                    q, kv_new, None,
                    q_index, block_ids, seq_lens, max_seqlens_q,
                    kscale=kv_sc, vscale=kv_sc,
                    cache_layout="NHD_FUSED",
                )
            else:
                attn = attention_decode(
                    q, kv_new, None, block_ids, seq_lens,
                    mtp=mtp, new_kv_included=True,
                    kscale=kv_sc, vscale=kv_sc,
                    cache_layout="NHD_FUSED",
                )
        elif cfg.fp8_kv:
            q, q_scale, _, k_new, v_new = rope_norm_store_kv_fp8(
                caches[li]["k"],
                caches[li]["v"],
                qkv,
                weights["cos_sin"],
                seq_lens,
                q_index,
                block_ids,
                is_prefill,
                jnp.ones((1,), jnp.float32),
                jnp.ones((1,), jnp.float32),
                int(QuantPolicy.DYNAMIC_Q_STATIC_KV),
                max_seqlens=max_seqlens_q,
                cache_layout="HND",
                zero_tails=False,  # attention masks by kv_len; skip the pass
            )
        else:
            q, k_new, v_new = rope_norm_store_kv(
                caches[li]["k"],
                caches[li]["v"],
                qkv,
                weights["cos_sin"],
                seq_lens,
                q_index,
                block_ids,
                is_prefill,
                cache_layout="HND",
                zero_tails=False,  # attention masks by kv_len; skip the pass
                # decode batches have one real (or dummy-page-parked) token
                # per row, satisfying the fused kernel's all-rows-valid
                # contract; engine prefill pads rows -> XLA path.
                impl="xla" if is_prefill else "pallas",
            )
            q_scale = None
        if not cfg.int8_kv:
            new_caches.append({"k": k_new, "v": v_new})
            if is_prefill:
                if cfg.fp8_kv:
                    attn = attention_with_kvcache_prefill(
                        q, k_new, v_new,
                        q_index, block_ids, seq_lens, max_seqlens_q,
                        qscale=q_scale,
                        kscale=jnp.ones((1,), jnp.float32),
                        vscale=jnp.ones((1,), jnp.float32),
                        cache_layout="HND",
                    )
                else:
                    attn = attention_with_kvcache_prefill(
                        q, k_new, v_new,
                        q_index, block_ids, seq_lens, max_seqlens_q,
                        cache_layout="HND",
                    )
            else:
                attn = attention_decode(
                    q, k_new, v_new, block_ids, seq_lens,
                    mtp=mtp, new_kv_included=True,
                    qscale=q_scale,
                    kscale=jnp.ones((1,), jnp.float32) if cfg.fp8_kv else None,
                    vscale=jnp.ones((1,), jnp.float32) if cfg.fp8_kv else None,
                    cache_layout="HND",
                )

        attn_partial = _mm(attn.reshape(rows, -1), layer, "wo")  # partial over tp
        if cfg.residual_alpha != 1.0:
            attn_partial = attn_partial * cfg.residual_alpha

        # fused allreduce + residual + mlp-norm
        if axis_name is not None:
            h_normed, x_res = fuse_allreduce_rmsnorm(
                attn_partial, x_res, layer["mlp_norm"], cfg.norm_eps, axis_name,
                mode="one_shot",
            )
        else:
            x_res = (x_res.astype(jnp.float32) + attn_partial.astype(jnp.float32)).astype(
                jnp.bfloat16
            )
            h_normed = rmsnorm_ref(x_res, layer["mlp_norm"], cfg.norm_eps).astype(
                jnp.bfloat16
            )

        if cfg.moe is None:
            mlp_partial = _mlp_dense(h_normed, layer)
        else:
            mlp_partial = _mlp_moe(h_normed, layer, cfg, rank_ep)
        if cfg.residual_alpha != 1.0:
            mlp_partial = mlp_partial * cfg.residual_alpha

        next_norm = (
            weights["layers"][li + 1]["attn_norm"]
            if li + 1 < cfg.layers
            else weights["final_norm"]
        )
        if axis_name is not None:
            h_normed, x_res = fuse_allreduce_rmsnorm(
                mlp_partial.astype(jnp.bfloat16), x_res, next_norm, cfg.norm_eps,
                axis_name, mode="one_shot",
            )
        else:
            x_res = (x_res.astype(jnp.float32) + mlp_partial.astype(jnp.float32)).astype(
                jnp.bfloat16
            )
            h_normed = rmsnorm_ref(x_res, next_norm, cfg.norm_eps).astype(jnp.bfloat16)

    # h_normed is final-normed; logits for the last token of each request
    if return_all_logits:
        return h_normed @ weights["lm_head"], new_caches
    last_rows = q_index[1:] - 1  # [B]
    final = h_normed[last_rows]
    logits = final @ weights["lm_head"]
    if temperature > 0:
        tokens = fused_sampler_temperature_sample(
            logits.astype(jnp.float32), temperature, seed=sample_seed
        )
        return tokens, new_caches
    return logits, new_caches


def decode_multi(
    weights,
    caches,
    cfg: ModelConfig,
    last_tokens: jax.Array,  # [B] int32 — last sampled token per slot
    seq_lens: jax.Array,  # [B] int32 — total tokens incl. the input token
    block_ids: jax.Array,  # [B, max_blocks] (pre-extended for num_steps)
    num_steps: int,
    temperature: float = 0.0,
    sample_seed: int = 0,
    axis_name: Optional[str] = None,
    rank_ep: int = 0,
    return_logprobs: bool = False,
):
    """``num_steps`` decode steps in ONE compiled graph (lax.scan): forward,
    in-graph sampling, cache append, feed the token back — no host round
    trip between steps. On a tunneled/remote attachment one dispatch costs
    ~30ms, so fusing N steps multiplies serving throughput by up to N; on
    local hardware it still removes per-step dispatch + readback.

    The caller must pre-extend each slot's page table to cover
    ``seq_lens + num_steps - 1`` KV slots (the engine reserves
    ``multi_step - 1`` slack, see :class:`hpc_ops_tpu.runtime.Engine`).
    Greedy (temperature=0) matches single-step decode token-exactly;
    temperature>0 draws per-step Gumbel noise from
    ``fold_in(PRNGKey(sample_seed), step)``.

    Returns (tokens [num_steps, B] int32, new_caches), or with
    ``return_logprobs`` ((tokens, logprobs [num_steps, B] f32), new_caches)
    where logprobs are log-softmax of each sampled token.
    """
    b = seq_lens.shape[0]
    q_index = jnp.arange(b + 1, dtype=jnp.int32)

    def body(carry, i):
        toks, lens, caches = carry
        logits, caches = forward_step(
            weights,
            caches,
            cfg,
            toks,
            lens,
            q_index,
            block_ids,
            is_prefill=False,
            axis_name=axis_name,
            rank_ep=rank_ep,
            max_seqlens_q=1,
        )
        if temperature > 0:
            key = jax.random.fold_in(jax.random.PRNGKey(sample_seed), i)
            noise = gumbel_from_uniform(
                jax.random.uniform(key, logits.shape, jnp.float32, 1e-20, 1.0)
            )
            nxt = fused_sampler_temperature_sample(
                logits.astype(jnp.float32), temperature, gumbel_noise=noise
            ).reshape(-1)
        else:
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if return_logprobs:
            lsm = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            lp = jnp.take_along_axis(lsm, nxt[:, None], axis=-1)[:, 0]
            return (nxt, lens + 1, caches), (nxt, lp)
        return (nxt, lens + 1, caches), nxt

    (_, _, caches), out = jax.lax.scan(
        body,
        (last_tokens.astype(jnp.int32), seq_lens.astype(jnp.int32), caches),
        jnp.arange(num_steps),
    )
    return out, caches


def shard_weights_specs(cfg: ModelConfig):
    """PartitionSpecs for shard_map over a (dp, tp) mesh."""
    layer_spec = {
        "attn_norm": P(),
        "wqkv": P(None, "tp"),
        "wo": P("tp", None),
        "mlp_norm": P(),
    }
    if cfg.qkv_bias:
        layer_spec["qkv_bias"] = P("tp")
    if cfg.dense_int8:
        # scales follow their weight's sharded dim: column-sharded weights
        # shard the per-column scale, row-sharded weights replicate it
        layer_spec["wqkv_scale"] = P("tp")
        layer_spec["wo_scale"] = P()
        if cfg.moe is None:
            layer_spec["w_gate_up_scale"] = P("tp")
            layer_spec["w_down_scale"] = P()
    if cfg.moe is None:
        layer_spec.update({"w_gate_up": P(None, "tp"), "w_down": P("tp", None)})
    else:
        scale_spec = (
            P("tp", None, None)  # [E, N//128, Kb] per-block scales
            if cfg.moe.scheme == "blockwise_int8"
            else P("tp")  # [E] per-expert scales
        )
        layer_spec.update(
            {
                "router": P(),
                "moe_gate_up": P("tp", None, None),
                "moe_down": P("tp", None, None),
                "moe_gate_up_scale": scale_spec,
                "moe_down_scale": scale_spec,
            }
        )
        if cfg.moe.scheme == "pertensor_int8":
            layer_spec["moe_act_scale"] = P()
    return {
        "embed": P(),
        "final_norm": P(),
        "lm_head": P(),
        "layers": [dict(layer_spec) for _ in range(cfg.layers)],
        "cos_sin": P(),
    }


def make_sharded_step(mesh, cfg: ModelConfig, is_prefill: bool = False, **fw_kw):
    """Build a shard_map'd forward step over a (dp, tp) mesh.

    The wqkv projection is tp-sharded by heads; note wqkv's packed layout
    [H, (Hq + 2*Hkv) * D] is sharded by reordering into per-rank
    [H, (Hq/tp + 2*Hkv/tp) * D] — use :func:`repack_qkv_for_tp` on the weight
    before placing it.
    """
    wspecs = shard_weights_specs(cfg)
    # Row axes = every mesh axis except "tp": "dp" on a single slice,
    # ("ddp", "dp") on a hybrid multi-host mesh (make_hybrid_mesh) — request
    # rows and page pools shard across hosts over DCN, while all
    # collective-heavy sharding (heads, experts, the fused allreduce+norm)
    # stays on the ICI "tp" axis. This is BASELINE config 5's layout: TP
    # within a host, continuous batching across hosts.
    row_axes = tuple(a for a in mesh.axis_names if a != "tp")
    rows = row_axes if len(row_axes) > 1 else row_axes[0]
    # caches: KV heads sharded over tp, page pool sharded over the row axes
    # (each row shard owns its requests' pages; block_ids are shard-local).
    # The int8 NHD_FUSED slab is slot-leading [nb, 2*bs, Hkv*D]: pages on
    # the row axes, heads in the lane dim over tp.
    one_spec = (
        {"kv": P(rows, None, "tp")}
        if cfg.int8_kv
        else {"k": P("tp", rows), "v": P("tp", rows)}
    )
    cache_spec = [one_spec for _ in range(cfg.layers)]
    data_specs = (
        P(rows),  # token_ids (rows sharded over the request-owning axes)
        P(rows),  # seq_lens
        P(rows),  # q_index: per-shard prefix sums, CONCATENATED over shards
        #           ([0,1,2] per shard -> [0,1,2, 0,1,2, ...]); per-shard
        #           values may differ (hosts prefill different lengths)
        P(rows),  # block_ids (values index the shard-local page pool)
    )

    def step(weights, caches, token_ids, seq_lens, q_index, block_ids):
        rank_ep = jax.lax.axis_index("tp")
        out, new_caches = forward_step(
            weights,
            caches,
            cfg,
            token_ids,
            seq_lens,
            q_index,
            block_ids,
            is_prefill,
            axis_name="tp",
            rank_ep=rank_ep,
            **fw_kw,
        )
        return out, new_caches

    return shard_map(
        step,
        mesh=mesh,
        in_specs=(wspecs, cache_spec, *data_specs),
        out_specs=(P(rows), cache_spec),
        check_vma=False,
    )


def make_sharded_multi_step(
    mesh, cfg: ModelConfig, num_steps: int, return_logprobs: bool = False,
    temperature: float = 0.0, **dm_kw,
):
    """Sharded counterpart of :func:`decode_multi`: one shard_map'd graph
    runs ``num_steps`` decode iterations over the (…rows…, "tp") mesh with
    in-graph sampling — the multi-host analog of Engine(multi_step=N).
    Same data/cache specs as :func:`make_sharded_step`; returns
    (tokens [num_steps, rows], new_caches)."""
    wspecs = shard_weights_specs(cfg)
    row_axes = tuple(a for a in mesh.axis_names if a != "tp")
    rows = row_axes if len(row_axes) > 1 else row_axes[0]
    one_spec = (
        {"kv": P(rows, None, "tp")} if cfg.int8_kv else {"k": P("tp", rows), "v": P("tp", rows)}
    )
    cache_spec = [one_spec for _ in range(cfg.layers)]
    # last_tokens, seq_lens, block_ids (row-sharded) + replicated seed
    data_specs = (P(rows), P(rows), P(rows), P())

    def step(weights, caches, last_tokens, seq_lens, block_ids, sample_seed):
        rank_ep = jax.lax.axis_index("tp")
        return decode_multi(
            weights,
            caches,
            cfg,
            last_tokens,
            seq_lens,
            block_ids,
            num_steps,
            temperature=temperature,
            sample_seed=sample_seed,
            axis_name="tp",
            rank_ep=rank_ep,
            return_logprobs=return_logprobs,
            **dm_kw,
        )

    out_spec = (
        (P(None, rows), P(None, rows)) if return_logprobs else P(None, rows)
    )
    return shard_map(
        step,
        mesh=mesh,
        in_specs=(wspecs, cache_spec, *data_specs),
        out_specs=(out_spec, cache_spec),
        check_vma=False,
    )


def repack_qkv_for_tp(wqkv: jax.Array, cfg: ModelConfig, tp: int) -> jax.Array:
    """Reorder packed [H, (Hq+2Hkv)*D] columns so a tp-split gives each rank
    its own contiguous [q_heads/tp | k_heads/tp | v_heads/tp] block.
    Rows pass through untouched (a [1, cols] bias view repacks the same
    way)."""
    h = wqkv.shape[0]
    d = cfg.head_dim
    q, kh = cfg.q_heads, cfg.kv_heads
    wq = wqkv[:, : q * d].reshape(h, tp, q // tp * d)
    wk = wqkv[:, q * d : (q + kh) * d].reshape(h, tp, kh // tp * d)
    wv = wqkv[:, (q + kh) * d :].reshape(h, tp, kh // tp * d)
    return jnp.concatenate([wq, wk, wv], axis=-1).reshape(h, -1)


def repack_gate_up_for_tp(w_gate_up: jax.Array, tp: int) -> jax.Array:
    """Reorder packed [H, 2I] (gate|up halves) columns so a tp-split gives
    each rank its own contiguous [gate_r | up_r] block."""
    h, two_i = w_gate_up.shape
    i = two_i // 2
    g = w_gate_up[:, :i].reshape(h, tp, i // tp)
    u = w_gate_up[:, i:].reshape(h, tp, i // tp)
    return jnp.concatenate([g, u], axis=-1).reshape(h, -1)


def shard_weights_for_tp(weights, cfg: ModelConfig, tp: int):
    """Apply the column repacks needed before placing weights on a tp mesh."""
    layers = []
    for l in weights["layers"]:
        nl = {**l, "wqkv": repack_qkv_for_tp(l["wqkv"], cfg, tp)}
        if "qkv_bias" in l:
            nl["qkv_bias"] = repack_qkv_for_tp(
                l["qkv_bias"][None, :], cfg, tp
            ).reshape(-1)
        if "wqkv_scale" in l:
            nl["wqkv_scale"] = repack_qkv_for_tp(
                l["wqkv_scale"][None, :], cfg, tp
            ).reshape(-1)
        if "w_gate_up" in l:
            nl["w_gate_up"] = repack_gate_up_for_tp(l["w_gate_up"], tp)
        if "w_gate_up_scale" in l:
            nl["w_gate_up_scale"] = repack_gate_up_for_tp(
                l["w_gate_up_scale"][None, :], tp
            ).reshape(-1)
        layers.append(nl)
    return {**weights, "layers": layers}


__all__ = [
    "ModelConfig",
    "MoEConfig",
    "llama3_8b",
    "tiny_config",
    "init_weights",
    "quantize_w8",
    "init_cache",
    "forward_step",
    "decode_multi",
    "make_sharded_step",
    "make_sharded_multi_step",
    "shard_weights_specs",
    "repack_qkv_for_tp",
    "repack_gate_up_for_tp",
    "shard_weights_for_tp",
]
