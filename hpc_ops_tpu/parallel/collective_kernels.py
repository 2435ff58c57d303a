"""Pallas-native fused AllReduce+Residual+RMSNorm over ICI.

Reference parity: the multicast collective kernels (SURVEY.md §2.2, ops
#14/#15). The reference's substrate is NVLink multicast: symmetric buffers
mapped on every rank, multimem.ld_reduce one-load-sums-all, and a signal-pad
handshake (fuse_allreduce_rmsnorm_high_throughput.cu:15-99; the low-latency
variant uses a two-shot schedule with Lamport sentinels,
fuse_allreduce_rmsnorm_low_latency.cu).

TPU mapping: there is no multimem on ICI, so the schedules become explicit
remote DMAs between symmetric buffers with semaphore signaling — the
semaphores play the reference's signal pad, ``get_barrier_semaphore`` plays
the entry handshake:

  * ``one_shot`` (latency-optimal, small token counts): every chip pushes
    its partial x to all peers' comm buffers, then each chip reduces all ws
    slabs locally and applies residual+RMSNorm fused — (ws-1)*N*H bytes
    sent per chip, one network hop.
  * ``two_shot`` (bandwidth-optimal): reduce-scatter by pushing row-chunk c
    to its owner, the owner reduces + applies the fused norm to its 1/ws
    slice, then the normalized chunks (and residual sums) are pushed
    straight into every peer's output buffer — 2*(ws-1)/ws*N*H bytes per
    chip, two hops (the schedule the reference's low-latency kernel uses,
    hpc/allreduce.py:117).

Both run as ONE kernel per chip per call: the normalization happens while
the reduced data is still in VMEM — nothing round-trips HBM between the
reduction and the norm, which is the point of the fusion.

Slot convention for symmetric receive buffers: the sender at ring offset p
(peer = my+p) writes into the receiver's slot ws-p, so every receiver's
slots 1..ws-1 are filled by distinct senders and all slot indices are
static (slot s on chip r holds the message from chip r+s mod ws).

Remote-copy sources live in ANY/HBM memory (inputs, or outputs used as
staging) — remote DMAs source from unblocked refs.

Testing: interpret mode (pltpu.InterpretParams) simulates the remote DMAs
on a host-device mesh, so correctness runs in CI without a pod.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fuse_allreduce_rmsnorm_pallas"]


def _norm(acc, res, w_ref, eps):
    out_res = acc + res
    rms = jax.lax.rsqrt(
        jnp.mean(out_res * out_res, axis=-1, keepdims=True) + eps
    )
    w = w_ref[...].astype(jnp.float32).reshape(1, -1)
    return (out_res * rms) * w, out_res


def _entry_barrier(axis, ws):
    my = jax.lax.axis_index(axis)
    barrier = pltpu.get_barrier_semaphore()
    for p in range(1, ws):
        peer = jax.lax.rem(my + p, ws)
        pltpu.semaphore_signal(
            barrier, 1, device_id=(peer,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
    pltpu.semaphore_wait(barrier, ws - 1)
    return my


def _one_shot_kernel(
    x_hbm,  # [N, H] ANY — this chip's partials (remote-copy source)
    res_ref,  # [N, H] VMEM — replicated residual
    w_ref,  # [1, H] VMEM
    o_ref,  # [N, H] bf16 VMEM
    ores_ref,  # [N, H] bf16 VMEM
    comm,  # [ws, N, H] VMEM — symmetric receive buffer
    xsem,
    send_sems,  # DMA [ws]
    recv_sems,  # DMA [ws]
    *,
    axis: str,
    ws: int,
    eps: float,
):
    my = _entry_barrier(axis, ws)

    lc = pltpu.make_async_copy(x_hbm, comm.at[my], xsem)
    lc.start()

    # Sender writes into the receiver's slot indexed by the SENDER's
    # absolute chip id, and every chip accumulates slots in absolute order
    # below — all chips reduce in the same floating-point order, so the
    # "replicated" outputs are bitwise identical across the mesh.
    copies = []
    for p in range(1, ws):
        peer = jax.lax.rem(my + p, ws)
        rc = pltpu.make_async_remote_copy(
            x_hbm, comm.at[my], send_sems.at[p], recv_sems.at[p],
            device_id=(peer,), device_id_type=pltpu.DeviceIdType.MESH,
        )
        rc.start()
        copies.append(rc)

    lc.wait()
    for rc in copies:
        rc.wait()
    acc = comm[0].astype(jnp.float32)
    for s in range(1, ws):
        acc = acc + comm[s].astype(jnp.float32)

    out, out_res = _norm(acc, res_ref[...].astype(jnp.float32), w_ref, eps)
    o_ref[...] = out.astype(o_ref.dtype)
    ores_ref[...] = out_res.astype(ores_ref.dtype)


def _two_shot_kernel(
    x_hbm,  # [N, H] ANY
    res_hbm,  # [N, H] ANY (replicated; only my chunk is read)
    w_ref,  # [1, H] VMEM
    o_hbm,  # [N, H] bf16 ANY — doubles as the all-gather staging
    ores_hbm,  # [N, H] bf16 ANY
    xv,  # [C, H] VMEM — my chunk of x
    rv,  # [C, H] VMEM — my chunk of residual
    ov,  # [C, H] bf16 VMEM — normalized chunk staging
    orv,  # [C, H] bf16 VMEM
    comm,  # [ws, C, H] VMEM — reduce-scatter receive buffer
    lsem,
    osem,
    rs_send,
    rs_recv,
    ag_send,
    ag_recv,
    *,
    axis: str,
    ws: int,
    chunk: int,
    eps: float,
):
    my = _entry_barrier(axis, ws)
    row0 = my * chunk

    # local chunk loads overlap the reduce-scatter sends
    lx = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, chunk), :], xv, lsem)
    lx.start()
    lr = pltpu.make_async_copy(res_hbm.at[pl.ds(row0, chunk), :], rv, lsem)
    lr.start()

    rs = []
    for p in range(1, ws):
        peer = jax.lax.rem(my + p, ws)
        rc = pltpu.make_async_remote_copy(
            x_hbm.at[pl.ds(peer * chunk, chunk), :],
            comm.at[ws - p],
            rs_send.at[p],
            rs_recv.at[p],
            device_id=(peer,),
            device_id_type=pltpu.DeviceIdType.MESH,
        )
        rc.start()
        rs.append(rc)

    lx.wait()
    lr.wait()
    acc = xv[...].astype(jnp.float32)
    for rc in rs:
        rc.wait()
    for s in range(1, ws):
        acc = acc + comm[s].astype(jnp.float32)

    out_c, out_res_c = _norm(acc, rv[...].astype(jnp.float32), w_ref, eps)
    ov[...] = out_c.astype(ov.dtype)
    orv[...] = out_res_c.astype(orv.dtype)

    # stage my chunk into my own outputs, then push the same rows to peers
    so = pltpu.make_async_copy(ov, o_hbm.at[pl.ds(row0, chunk), :], osem)
    so.start()
    sr = pltpu.make_async_copy(orv, ores_hbm.at[pl.ds(row0, chunk), :], osem)
    sr.start()
    so.wait()
    sr.wait()

    ag = []
    for p in range(1, ws):
        peer = jax.lax.rem(my + p, ws)
        for send, recv, buf in (
            (ag_send, ag_recv, o_hbm),
            (rs_send, rs_recv, ores_hbm),  # rs semaphores are drained — reuse
        ):
            rc = pltpu.make_async_remote_copy(
                buf.at[pl.ds(row0, chunk), :],
                buf.at[pl.ds(row0, chunk), :],
                send.at[p],
                recv.at[p],
                device_id=(peer,),
                device_id_type=pltpu.DeviceIdType.MESH,
            )
            rc.start()
            ag.append(rc)
    for rc in ag:
        rc.wait()


def fuse_allreduce_rmsnorm_pallas(
    x,  # [N, H] this chip's partials (call under shard_map)
    residual,  # [N, H] replicated
    weight,  # [H]
    ws: int,  # static axis size (mesh.shape[axis_name])
    axis_name: str = "tp",
    mode: str = "one_shot",
    eps: float = 1e-6,
    interpret: bool = False,
    collective_id: int = 7,
):
    """Single-kernel fused collective+norm (see module docstring).

    Call inside ``shard_map`` over ``axis_name``. Returns
    (normed [N, H] bf16, out_residual [N, H] bf16), both replicated.
    ``two_shot`` requires N divisible by 8*ws (DMA sublane tiling on the
    row chunks).
    """
    n, h = x.shape
    if isinstance(interpret, pltpu.InterpretParams):
        itp = interpret
    elif interpret:
        # eager DMA execution avoids a thread-starvation deadlock in the
        # multi-device interpreter when many deferred DMAs are in flight
        itp = pltpu.InterpretParams(dma_execution_mode="eager")
    else:
        itp = False
    out_shapes = (
        jax.ShapeDtypeStruct((n, h), jnp.bfloat16),
        jax.ShapeDtypeStruct((n, h), jnp.bfloat16),
    )
    w2 = weight.reshape(1, -1)

    if mode == "one_shot":
        return pl.pallas_call(
            functools.partial(_one_shot_kernel, axis=axis_name, ws=ws, eps=eps),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((n, h), lambda: (0, 0)),
                pl.BlockSpec((1, h), lambda: (0, 0)),
            ],
            out_specs=(
                pl.BlockSpec((n, h), lambda: (0, 0)),
                pl.BlockSpec((n, h), lambda: (0, 0)),
            ),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.VMEM((ws, n, h), x.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA((ws,)),
                pltpu.SemaphoreType.DMA((ws,)),
            ],
            compiler_params=pltpu.CompilerParams(collective_id=collective_id),
            interpret=itp,
        )(x, residual, w2)

    if mode != "two_shot":
        raise ValueError(f"unknown mode {mode!r}")
    assert n % (8 * ws) == 0, "two_shot needs N divisible by 8*axis_size"
    chunk = n // ws
    return pl.pallas_call(
        functools.partial(
            _two_shot_kernel, axis=axis_name, ws=ws, chunk=chunk, eps=eps
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, h), lambda: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((chunk, h), x.dtype),
            pltpu.VMEM((chunk, h), residual.dtype),
            pltpu.VMEM((chunk, h), jnp.bfloat16),
            pltpu.VMEM((chunk, h), jnp.bfloat16),
            pltpu.VMEM((ws, chunk, h), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((ws,)),
            pltpu.SemaphoreType.DMA((ws,)),
            pltpu.SemaphoreType.DMA((ws,)),
            pltpu.SemaphoreType.DMA((ws,)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=collective_id),
        interpret=itp,
    )(x, residual, w2)
