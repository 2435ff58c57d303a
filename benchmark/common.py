"""Shared benchmark harness.

Methodology mirrors the reference (benchmark/fused_moe/worker.py:33-50,
benchmark/attention_decode/README.md "Timing Modes"): warmup runs are
dropped, latency is the median over replay samples, and results are emitted
as CSV + JSONL rows. The TPU analog of CUDA-Graph replay + Nsight projected
durations is a jitted function re-dispatched in a tight loop with
``jax.block_until_ready`` fencing; per-call dispatch overhead is amortized
by timing ``inner`` chained iterations per sample where requested.
"""

from __future__ import annotations

import csv
import json
import os
import time
from dataclasses import dataclass, field
from statistics import median
from typing import Any, Callable

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

PEAK_HBM_GBPS = {
    "TPU v5 lite": 819.0,  # v5e
    "TPU v5p": 2765.0,
    "TPU v5": 2765.0,
    "TPU v4": 1228.0,
    "TPU v6 lite": 1640.0,  # v6e / Trillium
}

# Dense bf16 peak TFLOP/s per chip (MXU); fp8/int8 doubles where supported.
PEAK_BF16_TFLOPS = {
    "TPU v5 lite": 197.0,
    "TPU v5p": 459.0,
    "TPU v5": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}

# Native s8xs8->s32 MXU peak (v5e/v6e run int8 at ~2x bf16 rate; v4/v5p
# have no native s8 speedup over bf16).
PEAK_INT8_TFLOPS = {
    "TPU v5 lite": 394.0,
    "TPU v5p": 459.0,
    "TPU v5": 459.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 1836.0,
}


def device_kind() -> str:
    return jax.devices()[0].device_kind


def peak_hbm_gbps() -> float:
    kind = device_kind()
    for k in sorted(PEAK_HBM_GBPS, key=len, reverse=True):
        if kind.startswith(k):
            return PEAK_HBM_GBPS[k]
    return 819.0


def peak_bf16_tflops() -> float:
    kind = device_kind()
    for k in sorted(PEAK_BF16_TFLOPS, key=len, reverse=True):
        if kind.startswith(k):
            return PEAK_BF16_TFLOPS[k]
    return 197.0


def peak_int8_tflops() -> float:
    kind = device_kind()
    for k in sorted(PEAK_INT8_TFLOPS, key=len, reverse=True):
        if kind.startswith(k):
            return PEAK_INT8_TFLOPS[k]
    return 394.0


def _sync(tree) -> None:
    """Force execution with a tiny device->host readback per leaf.

    ``jax.block_until_ready`` does not reliably wait for execution on
    tunneled/virtualized TPU attachments; fetching one element does.
    """
    import numpy as np

    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


_OVERHEAD: float | None = None


def dispatch_overhead() -> float:
    """Fixed seconds per dispatch + tiny-readback round trip.

    On tunneled TPU attachments this is ~30ms — larger than many kernels —
    so per-call timings subtract it. Measured once per process.
    """
    global _OVERHEAD
    if _OVERHEAD is None:
        import jax.numpy as jnp

        x = jnp.ones((8, 128), jnp.float32)
        f = jax.jit(lambda x: x + 1.0)
        _sync(f(x))
        samples = []
        for _ in range(7):
            t0 = time.perf_counter()
            _sync(f(x))
            samples.append(time.perf_counter() - t0)
        _OVERHEAD = float(median(samples))
    return _OVERHEAD


def time_fn(
    fn: Callable[..., Any],
    args: tuple = (),
    *,
    warmup: int = 2,
    iters: int = 10,
    jit: bool = True,
) -> float:
    """Median seconds per call of ``jit(fn)(*args)``, with the fixed
    dispatch/readback overhead subtracted.

    Arrays must be passed via ``args`` (closed-over arrays become jit
    constants, which some remote-compile setups ship over the wire).
    """
    f = jax.jit(fn) if jit else fn
    for _ in range(warmup):
        _sync(f(*args))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(f(*args))
        samples.append(time.perf_counter() - t0)
    overhead = dispatch_overhead() if jit else 0.0
    raw = float(median(samples))
    # floor at 5% of the raw sample: once the kernel is much smaller than
    # the fixed overhead the subtraction is noise-dominated
    return max(raw - overhead, 0.05 * raw)


class ChainTime(float):
    """``time_chain`` result: a float (seconds/iter) carrying measurement-
    quality metadata so benches can tag untrustworthy rows instead of
    committing physically impossible numbers (round-2 postmortem: a
    swallowed differential shipped a ``latency_us: 0.0 / frac_peak: 1920``
    row and >1.0-of-HBM-peak decode rows)."""

    suspect: bool = False
    reason: str = ""
    inner: int = 0
    signal_sec: float = 0.0

    def __new__(cls, value, *, suspect=False, reason="", inner=0,
                signal_sec=0.0):
        self = super().__new__(cls, value)
        self.suspect = suspect
        self.reason = reason
        self.inner = inner
        self.signal_sec = signal_sec
        return self


def time_chain(body: Callable[[Any], Any], init: Any, *,
               inner: int = 10, trials: int = 7,
               hint_sec: float | None = None,
               min_signal_sec: float = 0.04) -> ChainTime:
    """Differential chained timing — the trustworthy mode on this host.

    ``body(carry) -> carry`` is one op invocation whose inputs depend on the
    previous output (so XLA cannot fold the repeats; see the LICM trap note
    in axon-tpu-gotchas). Chains ``inner`` and ``2*inner`` iterations inside
    one jit and returns (t_2N - t_N) / N: the fixed ~30ms dispatch+readback
    overhead cancels exactly, unlike ``time_fn``'s subtraction, which is
    noise-dominated below ~50ms true latency.

    The estimator is the difference of per-chain MINIMA, not medians: the
    tunneled host sees bursty external interference (other tenants, the
    compile helper), which inflates a random subset of trials — the minimum
    is the interference-free run, while a median differencing can go
    negative when bursts land asymmetrically (observed: -16µs "latencies").

    ``hint_sec`` — caller's speed-of-light estimate of ONE call (bytes/peak
    or flops/peak). When given, ``inner`` is raised so the differential
    signal (inner x hint) is at least ``min_signal_sec``: with a ~30ms and
    *bursty* dispatch floor, a few-ms signal can be swallowed whole by
    asymmetric interference (observed: a 13ms true signal measured as
    2.1ms -> an impossible 3x-of-HBM-peak row). 40ms of signal makes the
    worst observed burst a <30% error instead of a 6x one.
    """
    if hint_sec is not None and hint_sec > 0:
        need = int(-(-min_signal_sec // hint_sec))
        inner = max(inner, min(need, 512))

    def measure(inner, trials):
        def make(n):
            def run(init):
                return jax.lax.fori_loop(0, n, lambda i, c: body(c), init)

            return jax.jit(run)

        runs = {n: make(n) for n in (inner, 2 * inner)}
        for f in runs.values():
            _sync(f(init))
        times = {n: [] for n in runs}
        for _ in range(trials):
            for n, f in runs.items():
                t0 = time.perf_counter()
                _sync(f(init))
                times[n].append(time.perf_counter() - t0)
        diff = min(times[2 * inner]) - min(times[inner])
        return diff / inner, min(times[2 * inner])

    sec, t2n = measure(inner, trials)
    if sec <= 0 and inner < 512:
        # Differential swallowed by bursty interference — retry once with a
        # 4x longer chain before giving up.
        inner = min(inner * 4, 512)
        sec, t2n = measure(inner, trials)
    if sec <= 0:
        # Still non-positive: report an *upper bound* (total 2N-chain wall
        # time over 2N iters still contains the dispatch floor) and mark the
        # row suspect — never emit a 0/negative latency.
        return ChainTime(t2n / (2 * inner), suspect=True,
                         reason="nonpositive_differential", inner=inner,
                         signal_sec=sec * inner)
    signal = sec * inner
    # Signal below half the target floor — either the op is far faster than
    # the caller's speed-of-light hint (impossible → mis-measured), the
    # inner cap bound (capped=True), or no hint was given for a tiny op.
    weak = signal < 0.5 * min_signal_sec
    return ChainTime(sec, suspect=weak,
                     reason="weak_signal" if weak else "", inner=inner,
                     signal_sec=signal)


def trace_fn(fn: Callable[..., Any], args: tuple, trace_dir: str,
             *, iters: int = 3, jit: bool = True) -> str | None:
    """Capture a jax.profiler trace of ``fn(*args)`` for XProf attribution
    (the nsys/NVTX analog, reference benchmark/fused_moe/worker.py:33-50).

    Returns the trace directory, or None if profiling is unavailable (some
    tunneled attachments cannot serve device traces).
    """
    f = jax.jit(fn) if jit else fn
    _sync(f(*args))  # compile outside the trace
    try:
        with jax.profiler.trace(trace_dir):
            for _ in range(iters):
                _sync(f(*args))
        return trace_dir
    except Exception as exc:  # pragma: no cover - host-dependent
        print(f"[trace_fn] profiling unavailable: {exc}")
        return None


@dataclass
class Reporter:
    """Collects result rows; writes CSV and JSONL like the reference benches."""

    csv_path: str | None = None
    jsonl_path: str | None = None
    rows: list = field(default_factory=list)

    # Row fields that are fractions of a *physical* peak; >1.05 is a
    # measurement artifact by definition (quantized caches report
    # bf16-equivalent "effective" rates separately and may exceed 1.0).
    _FRAC_FIELDS = ("frac_of_peak", "frac_peak", "frac_peak_bw",
                    "frac_peak_flops")

    def add(self, _time: float | None = None, **row) -> None:
        """Add a row. Pass the raw ``time_chain`` result as ``_time`` to
        propagate its suspect flag; rows whose frac-of-peak fields exceed
        the physical limit are flagged regardless."""
        row.setdefault("device", device_kind())
        if _time is not None and getattr(_time, "suspect", False):
            row["suspect"] = True
            row["suspect_reason"] = getattr(_time, "reason", "timing")
        for f in self._FRAC_FIELDS:
            v = row.get(f)
            if isinstance(v, (int, float)) and v > 1.05:
                row["suspect"] = True
                row["suspect_reason"] = (
                    row.get("suspect_reason", "") + f"+{f}>{v}"
                ).lstrip("+")
        self.rows.append(row)
        line = " ".join(f"{k}={v}" for k, v in row.items())
        print(line, flush=True)

    def flush(self) -> None:
        if self.jsonl_path:
            os.makedirs(os.path.dirname(self.jsonl_path) or ".", exist_ok=True)
            with open(self.jsonl_path, "a") as fh:
                for row in self.rows:
                    fh.write(json.dumps(row) + "\n")
        if self.csv_path and self.rows:
            os.makedirs(os.path.dirname(self.csv_path) or ".", exist_ok=True)
            keys = sorted({k for row in self.rows for k in row})
            new = not os.path.exists(self.csv_path)
            with open(self.csv_path, "a", newline="") as fh:
                w = csv.DictWriter(fh, fieldnames=keys)
                if new:
                    w.writeheader()
                for row in self.rows:
                    w.writerow(row)
