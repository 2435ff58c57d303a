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
    its partial x to all peers' comm buffers; each chip consumes peer slabs
    PROGRESSIVELY as their recv semaphores fire (in absolute chip order, so
    outputs stay bitwise replicated) and applies residual+RMSNorm fused —
    (ws-1)*N*H bytes sent per chip, one network hop.
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


def _skew_delay(my, skew: int, buf):
    """Test hook: per-chip busy-work (chip r spins ~r*skew VPU passes) so
    interpret-mode tests exercise out-of-order peer arrival — the TPU analog
    of the reference's Lamport tests with staggered ranks."""
    if not skew:
        return

    def spin(i, v):
        return v * 1.0000001 + 1e-7

    val = jax.lax.fori_loop(0, my * skew, spin, jnp.float32(1.0))
    # data-dependence so the loop cannot be DCE'd. ``buf`` must be a buffer
    # that is fully overwritten later and that no inbound DMA targets: a
    # read-modify-write on a comm slot races the peer slab landing in it
    # (observed: a stale-garbage NaN clobbering slot 0 under skew).
    buf[0, 0] = buf[0, 0] * jnp.where(val > 0, 1.0, 1.0).astype(buf.dtype)


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
    skew: int = 0,
):
    """Progressive-arrival one-shot: each peer's slab is consumed the moment
    its recv semaphore fires (reference's Lamport low-latency structure,
    fuse_allreduce_rmsnorm_low_latency.cu:33-143 — data is consumed as each
    rank's sentinel lands, not after a wait-all). Slots are still reduced in
    ABSOLUTE chip order so every chip sums in the same floating-point order
    and the replicated outputs stay bitwise identical across the mesh: the
    progressive win is that slab s's add overlaps slabs s+1.. still being in
    flight, instead of serializing max(arrivals) + all adds."""
    my = _entry_barrier(axis, ws)
    _skew_delay(my, skew, o_ref)

    lc = pltpu.make_async_copy(x_hbm, comm.at[my], xsem)
    lc.start()

    # Sender writes into the receiver's slot indexed by the SENDER's
    # absolute chip id and signals the receiver's recv_sems[sender_id], so
    # the receiver can wait each slot individually in absolute order.
    for p in range(1, ws):
        peer = jax.lax.rem(my + p, ws)
        pltpu.make_async_remote_copy(
            x_hbm, comm.at[my], send_sems.at[p], recv_sems.at[my],
            device_id=(peer,), device_id_type=pltpu.DeviceIdType.MESH,
        ).start()

    acc = jnp.zeros(comm.shape[1:], jnp.float32)
    for s in range(ws):
        # wait slot s alone: own slab via the local-copy semaphore, peer
        # slabs via a descriptor matching the inbound copy (same dst shape
        # -> same semaphore decrement)
        @pl.when(my == s)
        def _():
            pltpu.make_async_copy(x_hbm, comm.at[s], xsem).wait()

        @pl.when(my != s)
        def _():
            pltpu.make_async_remote_copy(
                x_hbm, comm.at[s], send_sems.at[0], recv_sems.at[s],
                device_id=(my,), device_id_type=pltpu.DeviceIdType.MESH,
            ).wait_recv()

        acc = acc + comm[s].astype(jnp.float32)

    out, out_res = _norm(acc, res_ref[...].astype(jnp.float32), w_ref, eps)
    o_ref[...] = out.astype(o_ref.dtype)
    ores_ref[...] = out_res.astype(ores_ref.dtype)

    # drain send semaphores (overlapped with the reduce + norm above)
    for p in range(1, ws):
        peer = jax.lax.rem(my + p, ws)
        pltpu.make_async_remote_copy(
            x_hbm, comm.at[my], send_sems.at[p], recv_sems.at[my],
            device_id=(peer,), device_id_type=pltpu.DeviceIdType.MESH,
        ).wait_send()


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
    skew: int = 0,
):
    my = _entry_barrier(axis, ws)
    _skew_delay(my, skew, ov)
    row0 = my * chunk

    # local chunk loads overlap the reduce-scatter sends
    lx = pltpu.make_async_copy(x_hbm.at[pl.ds(row0, chunk), :], xv, lsem)
    lx.start()
    lr = pltpu.make_async_copy(res_hbm.at[pl.ds(row0, chunk), :], rv, lsem)
    lr.start()

    # reduce-scatter sends: sender `my` writes the receiver's comm slot
    # indexed by the SENDER's absolute id and signals rs_recv[my] there
    for p in range(1, ws):
        peer = jax.lax.rem(my + p, ws)
        pltpu.make_async_remote_copy(
            x_hbm.at[pl.ds(peer * chunk, chunk), :],
            comm.at[my],
            rs_send.at[p],
            rs_recv.at[my],
            device_id=(peer,),
            device_id_type=pltpu.DeviceIdType.MESH,
        ).start()

    lx.wait()
    lr.wait()
    # progressive arrival (reference Lamport structure): consume each peer's
    # partial the moment its recv semaphore fires instead of waiting for all
    # — the owner of this chunk is the only reducer, so arrival-overlapped
    # accumulation in absolute order is deterministic per chunk.
    acc = xv[...].astype(jnp.float32)
    for s in range(ws):
        @pl.when(my != s)
        def _(s=s):
            pltpu.make_async_remote_copy(
                x_hbm.at[pl.ds(row0, chunk), :],
                comm.at[s],
                rs_send.at[0],
                rs_recv.at[s],
                device_id=(my,),
                device_id_type=pltpu.DeviceIdType.MESH,
            ).wait_recv()

        acc = acc + jnp.where(
            my == s, 0.0, comm[s].astype(jnp.float32)
        )

    out_c, out_res_c = _norm(acc, rv[...].astype(jnp.float32), w_ref, eps)
    ov[...] = out_c.astype(ov.dtype)
    orv[...] = out_res_c.astype(orv.dtype)

    # drain my reduce-scatter send semaphores (the all-gather below reuses
    # them); overlapped behind the norm compute above
    for p in range(1, ws):
        peer = jax.lax.rem(my + p, ws)
        pltpu.make_async_remote_copy(
            x_hbm.at[pl.ds(peer * chunk, chunk), :],
            comm.at[my],
            rs_send.at[p],
            rs_recv.at[my],
            device_id=(peer,),
            device_id_type=pltpu.DeviceIdType.MESH,
        ).wait_send()

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
    skew: int = 0,
):
    """Single-kernel fused collective+norm (see module docstring).

    Call inside ``shard_map`` over ``axis_name``. Returns
    (normed [N, H] bf16, out_residual [N, H] bf16), both replicated.
    ``two_shot`` requires N divisible by 8*ws (DMA sublane tiling on the
    row chunks).

    Both modes consume peer slabs PROGRESSIVELY (per-slot semaphore waits
    with incremental accumulation — the reference's Lamport low-latency
    structure) rather than barriering on all peers before reducing.
    ``skew`` is a test hook: chip r busy-spins ~r*skew VPU passes before
    sending, so interpret-mode tests exercise staggered peer arrival.
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
            functools.partial(
                _one_shot_kernel, axis=axis_name, ws=ws, eps=eps, skew=skew
            ),
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
            _two_shot_kernel, axis=axis_name, ws=ws, chunk=chunk, eps=eps,
            skew=skew,
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
