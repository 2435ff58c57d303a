"""Serve a HuggingFace Llama-family checkpoint end-to-end.

Loads a transformers model (here: a small random-init Llama for a
self-contained demo — substitute `LlamaForCausalLM.from_pretrained(...)`
for a real checkpoint), converts it to the framework's packed layout,
and serves a batch of prompts through the continuous-batching engine
with chunked prefill, prefix caching, and fused multi-step decode.

    python examples/serve_hf.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

from transformers import LlamaConfig, LlamaForCausalLM

from hpc_ops_tpu.models.convert import from_hf_llama
from hpc_ops_tpu.runtime.engine import Engine


def main():
    hf_model = LlamaForCausalLM(
        LlamaConfig(
            vocab_size=2048,
            hidden_size=512,
            intermediate_size=1024,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=1,
            max_position_embeddings=512,
        )
    ).eval()
    cfg, weights = from_hf_llama(hf_model)

    eng = Engine(
        cfg,
        weights,
        num_blocks=128,
        block_size=16,
        max_batch=4,
        prefill_chunk=64,  # long prompts stream in without stalling decode
        multi_step=8,  # 8 decode steps per compiled dispatch
        prefix_cache=True,  # shared prompt prefixes reuse KV pages
    )

    system = list(range(100, 140))  # shared "system prompt"
    prompts = [system + [200 + i] for i in range(4)]
    outs = eng.run(prompts, max_new=16)
    for i, out in enumerate(outs):
        print(f"request {i}: {out}")
    print("stats:", eng.stats)


if __name__ == "__main__":
    main()
