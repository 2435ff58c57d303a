"""Record/replay verification harness.

Reference parity: the reference's conftest TraceHook (conftest.py:85-145)
monkey-patches every public op, pickles args before/after each call, emits a
standalone replay script, and re-runs it under compute-sanitizer
memcheck/synccheck/racecheck (SURVEY.md §5).

TPU analog: CUDA race/memory sanitizers don't exist here, but the equivalent
guarantees are (a) the compiled Mosaic kernel agrees with the Pallas
*interpreter* (which checks the program semantics without compiler
scheduling), and (b) repeated compiled runs are bit-identical (no
nondeterministic memory effects). ``TraceHook`` wraps public ops, records
each call to disk, and ``replay_record`` re-executes it both ways and
compares bitwise.

Activate in pytest with ``HPC_SANITIZER=1`` (see tests/conftest.py), or wrap
functions manually::

    with TraceHook([module.op_fn]) as hook:
        run_workload()
    for rec in hook.records:
        replay_record(rec)
"""

from __future__ import annotations

import os
import pickle
import tempfile
from dataclasses import dataclass, field
from typing import Any, Callable

import numpy as np

import jax

from hpc_ops_tpu.utils.common import interpret_default, set_interpret_override


def _to_host(tree):
    return jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree
    )


@dataclass
class CallRecord:
    name: str
    module: str
    args: Any
    kwargs: Any
    outputs: Any
    path: str = ""


@dataclass
class TraceHook:
    """Wraps callables; records (args, kwargs, outputs) of every invocation."""

    fns: list
    out_dir: str = field(
        default_factory=lambda: os.environ.get(
            "HPC_SANITIZER_DIR", tempfile.mkdtemp(prefix="hpc_replay_")
        )
    )
    records: list = field(default_factory=list)
    _originals: list = field(default_factory=list)

    def __enter__(self):
        import importlib

        self._originals = []
        for fn in self.fns:
            mod = importlib.import_module(fn.__module__)
            name = fn.__name__
            self._originals.append((mod, name, fn))

            def make_wrapper(f, m, n):
                def wrapper(*args, **kwargs):
                    out = f(*args, **kwargs)
                    # ops invoked inside a jit trace see tracers, which have
                    # no host value — record only concrete (eager) calls,
                    # like the reference hook (its ops are always eager)
                    if any(
                        isinstance(x, jax.core.Tracer)
                        for x in jax.tree.leaves((args, kwargs, out))
                    ):
                        return out
                    rec = CallRecord(
                        name=n,
                        module=m.__name__,
                        args=_to_host(args),
                        kwargs=_to_host(kwargs),
                        outputs=_to_host(out),
                    )
                    rec.path = os.path.join(
                        self.out_dir, f"{m.__name__}.{n}.{len(self.records)}.pkl"
                    )
                    with open(rec.path, "wb") as fh:
                        pickle.dump(rec, fh)
                    self.records.append(rec)
                    return out

                wrapper.__name__ = n
                # preserve the defining module so nested hooks (e.g. a test's
                # own TraceHook under the suite-wide HPC_SANITIZER hook) can
                # resolve and re-wrap this function
                wrapper.__module__ = m.__name__
                return wrapper

            setattr(mod, name, make_wrapper(fn, mod, name))
        return self

    def __exit__(self, *exc):
        for mod, name, fn in self._originals:
            setattr(mod, name, fn)
        return False


def replay_record(rec: CallRecord | str, check_interpret: bool = True) -> None:
    """Re-execute a recorded call; assert compiled-run determinism and
    (optionally) compiled-vs-interpreter agreement."""
    import importlib

    if isinstance(rec, str):
        with open(rec, "rb") as fh:
            rec = pickle.load(fh)
    mod = importlib.import_module(rec.module)
    fn = getattr(mod, rec.name)

    # records store host numpy copies; ops may use functional-update (.at)
    # semantics that require jax arrays — round-trip leaves back to device
    import jax.numpy as jnp

    def _to_dev(tree):
        return jax.tree.map(
            lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
            tree,
        )

    rec_args = _to_dev(rec.args)
    rec_kwargs = _to_dev(rec.kwargs)

    def flat(out):
        leaves = jax.tree.leaves(_to_host(out))
        return [np.asarray(l) for l in leaves if isinstance(l, np.ndarray)]

    out1 = flat(fn(*rec_args, **rec_kwargs))
    out2 = flat(fn(*rec_args, **rec_kwargs))
    for a, b in zip(out1, out2):
        assert a.tobytes() == b.tobytes(), (
            f"{rec.module}.{rec.name}: nondeterministic output across replays"
        )
    want = flat(rec.outputs)
    for a, w in zip(out1, want):
        assert a.tobytes() == w.tobytes(), (
            f"{rec.module}.{rec.name}: replay differs from recorded output"
        )
    if check_interpret and not interpret_default():
        set_interpret_override(True)
        try:
            out_i = flat(fn(*rec_args, **rec_kwargs))
        finally:
            set_interpret_override(None)
        for a, b in zip(out1, out_i):
            a64 = np.asarray(a, np.float64) if a.dtype.kind in "fV" else a
            b64 = np.asarray(b, np.float64) if b.dtype.kind in "fV" else b
            # semantic agreement check: low-precision outputs (fp8/bf16) may
            # differ by a final-rounding ULP between Mosaic and interpreter,
            # which is large in absolute terms near the format's max.
            scale = max(float(np.max(np.abs(b64))), 1.0) if b64.size else 1.0
            assert np.allclose(
                a64, b64, atol=0.05 * scale, rtol=0.05, equal_nan=True
            ), f"{rec.module}.{rec.name}: compiled vs interpreter mismatch"


__all__ = ["TraceHook", "CallRecord", "replay_record"]
