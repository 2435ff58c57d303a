"""Generate docs/API.md from the package's public symbols and docstrings."""

import importlib
import inspect
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MODULES = [
    ("Attention", "hpc_ops_tpu.ops.attention"),
    ("Grouped GEMM", "hpc_ops_tpu.ops.group_gemm"),
    ("Fused MoE", "hpc_ops_tpu.ops.moe"),
    ("Route GEMM", "hpc_ops_tpu.ops.gemm"),
    ("RoPE + KV store", "hpc_ops_tpu.ops.rope"),
    ("KV cache", "hpc_ops_tpu.ops.kv_cache"),
    ("Normalization", "hpc_ops_tpu.ops.normalization"),
    ("Activation + quant", "hpc_ops_tpu.ops.activation"),
    ("Quantization", "hpc_ops_tpu.ops.quant"),
    ("Sampler", "hpc_ops_tpu.ops.sampler"),
    ("Stem sparse-mask generator", "hpc_ops_tpu.ops.stem"),
    ("Parallel / collectives", "hpc_ops_tpu.parallel"),
    ("Pallas collective kernels", "hpc_ops_tpu.parallel.collective_kernels"),
    ("Ring attention (sequence parallel)", "hpc_ops_tpu.parallel.ring_attention"),
    ("Serving runtime", "hpc_ops_tpu.runtime"),
    ("Serving engine", "hpc_ops_tpu.runtime.engine"),
    ("Multi-host serving engine", "hpc_ops_tpu.runtime.sharded_engine"),
    ("Models", "hpc_ops_tpu.models.llama"),
    ("Record/replay harness", "hpc_ops_tpu.utils.replay"),
]


def main():
    out = [
        "# API reference",
        "",
        "Auto-generated (`python docs/generate_api.py`). Every public op is",
        "importable from the package root: `import hpc_ops_tpu as hpc`.",
        "",
    ]
    for title, modname in MODULES:
        mod = importlib.import_module(modname)
        names = getattr(mod, "__all__", None)
        if names is None:
            names = [n for n in dir(mod) if not n.startswith("_")]
        out.append(f"## {title} (`{modname}`)")
        out.append("")
        for n in names:
            obj = getattr(mod, n, None)
            if obj is None:
                continue
            doc = (inspect.getdoc(obj) or "").strip().split("\n\n")[0]
            doc = " ".join(line.strip() for line in doc.splitlines())
            try:
                sig = str(inspect.signature(obj))
            except (TypeError, ValueError):
                sig = ""
            if len(sig) > 100:
                sig = sig[:97] + "..."
            out.append(f"### `{n}{sig}`")
            if doc:
                out.append(f"{doc}")
            out.append("")
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "API.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
