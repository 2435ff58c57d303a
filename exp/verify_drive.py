import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, time
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.3)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', 0)
import hpc_ops_tpu as hpc
from hpc_ops_tpu.ops.attention.paging import nhd_to_hnd
from hpc_ops_tpu.ops.quant import quantize_kv_fused_int8

t0 = time.time()
q = jax.random.normal(jax.random.PRNGKey(0), (4, 32, 128), jnp.bfloat16)
kc = jax.random.normal(jax.random.PRNGKey(1), (12, 64, 8, 128), jnp.bfloat16)
vc = jax.random.normal(jax.random.PRNGKey(2), (12, 64, 8, 128), jnp.bfloat16)
bid = jnp.tile(jnp.arange(2, dtype=jnp.int32)[None], (4, 1))
sl = jnp.full((4,), 100, jnp.int32)
ref = hpc.attention_decode(q, kc, vc, bid, sl, new_kv_included=True)
print('ref decode done', time.time()-t0, flush=True)
kvf, ks, vs = quantize_kv_fused_int8(nhd_to_hnd(kc), nhd_to_hnd(vc))
out = hpc.attention_decode(q, kvf, None, bid, sl, new_kv_included=True,
                           cache_layout='FUSED', kscale=ks, vscale=vs)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
print('TPU fused-int8 max err vs bf16:', err, time.time()-t0, flush=True)
assert err < 0.15, err

from hpc_ops_tpu.runtime.engine import Engine
from hpc_ops_tpu.models.llama import ModelConfig, init_weights
cfg = ModelConfig(vocab=128, hidden=64, layers=1, q_heads=4, kv_heads=2, head_dim=16, intermediate=128)
w = init_weights(jax.random.PRNGKey(0), cfg)
eng = Engine(cfg, w, num_blocks=16, block_size=8, max_batch=2, max_blocks_per_seq=2)
try:
    eng.add_request(list(range(100)), max_new=8)
    print('FAIL: oversized request accepted', flush=True)
except ValueError as e:
    print('engine guard ok:', str(e)[:50], flush=True)
