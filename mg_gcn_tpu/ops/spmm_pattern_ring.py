"""Fused RDMA-ring collective pattern SpMM (the multi-chip MXU fast path).

The XLA-level distributed pattern path (parallel/dist.py
``dist_aggregate_pattern``) alternates P pallas kernel launches with
``lax.ppermute`` collectives; XLA can overlap them, but each round still pays
a kernel launch + collective issue gap, and the feature block is circulated
in float32. This module fuses the whole P-round schedule into ONE pallas
kernel per device using inter-chip RDMA (``pltpu.make_async_remote_copy``),
the TPU-native equivalent of the reference's high-priority-NCCL-stream +
double-buffered broadcast pipeline (cuda_utils.hpp:58-92, matrix.hpp:53-60):

* comm buffer = P-1 HBM slots per device; a ring of RDMAs fills slot t with
  the feature block of device (me+t+1) % P (all-gather schedule: receive,
  forward to the left neighbor, consume);
* grid = (out_block, round, contraction): round s's MXU work starts as soon
  as slot s-1 lands, overlapping the remaining P-2-s transfers — the
  "collective matmul" technique used by production TPU tensor-parallel
  kernels, applied to graph aggregation;
* blocks circulate in the compute dtype (bf16), halving ICI bytes vs the
  f32 ppermute path;
* per-round pattern tiles stream through the normal pallas pipeline; the
  circulating operand is staged HBM->VMEM with a 2-slot double buffer.

Semantics per device j (m = rows per shard, ring order k_s = (j+s) % P):

  forward  ("PT", feature-major): Cf = sum_s Bf_{k_s} @ pack[s]-planes
  backward ("P",  row-major):     C  = sum_s pack[s]-planes @ G_{k_s}

identical to ``dist_aggregate_pattern``'s per-round math; scale fusion
(pre/post) stays in the caller. Select with strategy="fused" (CLI: -N fused
ring is opt-in; validated in TPU interpret mode on a CPU mesh, see
tests/test_pattern_ring.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spmm_pattern import GROUP, J_FWD, O_BWD, _acc_dtype, _planes

LOGICAL = pltpu.DeviceIdType.LOGICAL


def _interp(interpret):
    if not interpret:
        return False
    # RDMA needs the TPU-semantics interpreter, not the generic one
    return pltpu.InterpretParams()


def _neighbors(axis_name: str, parts: int):
    my = jax.lax.axis_index(axis_name)
    left = jax.lax.rem(my - 1 + parts, parts)
    right = jax.lax.rem(my + 1, parts)
    return left, right


def _entry_barrier(left, right):
    """All ring neighbors entered the kernel (their comm slots exist)."""
    bsem = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(bsem, inc=1, device_id=left, device_id_type=LOGICAL)
    pltpu.semaphore_signal(bsem, inc=1, device_id=right, device_id_type=LOGICAL)
    pltpu.semaphore_wait(bsem, 2)


def _ring_exchange(x_ref, comm, send_sem, recv_sem, s, parts, left, right):
    """Round-s comm schedule (call at the first grid step of round s):

    s == 0 : barrier, then launch own block -> left.comm[0]
    s  > 0 : wait slot s-1; if another hop remains, forward it to
             left.comm[s]  (device (me+s) % P's block continues around)
    """

    @pl.when(s == 0)
    def _():
        _entry_barrier(left, right)
        pltpu.make_async_remote_copy(
            src_ref=x_ref,
            dst_ref=comm.at[0],
            send_sem=send_sem.at[0],
            recv_sem=recv_sem.at[0],
            device_id=left,
            device_id_type=LOGICAL,
        ).start()

    @pl.when(s > 0)
    def _():
        t = s - 1
        pltpu.make_async_remote_copy(
            src_ref=comm.at[t],
            dst_ref=comm.at[t],
            send_sem=send_sem.at[t],
            recv_sem=recv_sem.at[t],
            device_id=left,
            device_id_type=LOGICAL,
        ).wait_recv()

        @pl.when(s < parts - 1)
        def _():
            pltpu.make_async_remote_copy(
                src_ref=comm.at[t],
                dst_ref=comm.at[t + 1],
                send_sem=send_sem.at[t + 1],
                recv_sem=recv_sem.at[t + 1],
                device_id=left,
                device_id_type=LOGICAL,
            ).start()


def _drain_sends(comm, send_sem, recv_sem, left, parts):
    """Wait for all forwarded sends before the kernel exits."""
    for t in range(parts - 1):
        pltpu.make_async_remote_copy(
            src_ref=comm.at[t],
            dst_ref=comm.at[t],
            send_sem=send_sem.at[t],
            recv_sem=recv_sem.at[t],
            device_id=left,
            device_id_type=LOGICAL,
        ).wait_send()


def _fwd_ring_kernel(
    bf_ref,  # ANY (d_pad, m) op_dt — own feature block, feature-major
    pack_ref,  # VMEM (1, J_FWD, 128) — round-s pattern tile (pipelined)
    out_ref,  # VMEM (d_pad, GROUP) f32 accumulator block
    comm,  # HBM (P-1, d_pad, m) op_dt ring slots
    stage,  # VMEM (2, d_pad, J_FWD) op_dt staging
    cp_sem,  # DMA (2,)
    send_sem,  # DMA (P-1,)
    recv_sem,  # DMA (P-1,)
    *,
    parts: int,
    n_cb: int,
    axis_name: str,
    cdtype,
):
    g, s, cb = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    left, right = _neighbors(axis_name, parts)

    @pl.when((g == 0) & (cb == 0))
    def _():
        _ring_exchange(bf_ref, comm, send_sem, recv_sem, s, parts, left, right)

    def stage_cp(src_ref, idx, slot):
        return pltpu.make_async_copy(
            src_ref.at[:, pl.ds(idx * J_FWD, J_FWD)], stage.at[slot], cp_sem.at[slot]
        )

    # double-buffered staging of the circulating operand (own block for
    # round 0, comm slot s-1 otherwise)
    @pl.when(s == 0)
    def _():
        @pl.when(cb == 0)
        def _():
            stage_cp(bf_ref, 0, 0).start()

        @pl.when(cb + 1 < n_cb)
        def _():
            stage_cp(bf_ref, cb + 1, (cb + 1) % 2).start()

        stage_cp(bf_ref, cb, cb % 2).wait()

    @pl.when(s > 0)
    def _():
        src = comm.at[s - 1]

        @pl.when(cb == 0)
        def _():
            stage_cp(src, 0, 0).start()

        @pl.when(cb + 1 < n_cb)
        def _():
            stage_cp(src, cb + 1, (cb + 1) % 2).start()

        stage_cp(src, cb, cb % 2).wait()

    @pl.when((s == 0) & (cb == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    bf = stage[cb % 2]
    pack = pack_ref[0].astype(jnp.int32)
    for b, plane in _planes(pack, cdtype):
        sl = slice(b * 128, (b + 1) * 128)
        out_ref[:, sl] += jnp.dot(bf, plane, preferred_element_type=_acc_dtype(cdtype))

    last = (
        (g == pl.num_programs(0) - 1)
        & (s == pl.num_programs(1) - 1)
        & (cb == pl.num_programs(2) - 1)
    )

    @pl.when(last)
    def _():
        _drain_sends(comm, send_sem, recv_sem, left, parts)


def _bwd_ring_kernel(
    g_ref,  # ANY (m, d_pad) op_dt — own gradient block, row-major
    pack_ref,  # VMEM (1, O_BWD, 128)
    out_ref,  # VMEM (O_BWD, d_pad) accumulator block
    comm,  # HBM (P-1, m, d_pad)
    stage,  # VMEM (2, GROUP, d_pad)
    cp_sem,
    send_sem,
    recv_sem,
    *,
    parts: int,
    n_gg: int,
    axis_name: str,
    cdtype,
):
    rb, s, gg = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    left, right = _neighbors(axis_name, parts)

    @pl.when((rb == 0) & (gg == 0))
    def _():
        _ring_exchange(g_ref, comm, send_sem, recv_sem, s, parts, left, right)

    def stage_cp(src_ref, idx, slot):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(idx * GROUP, GROUP), :], stage.at[slot], cp_sem.at[slot]
        )

    @pl.when(s == 0)
    def _():
        @pl.when(gg == 0)
        def _():
            stage_cp(g_ref, 0, 0).start()

        @pl.when(gg + 1 < n_gg)
        def _():
            stage_cp(g_ref, gg + 1, (gg + 1) % 2).start()

        stage_cp(g_ref, gg, gg % 2).wait()

    @pl.when(s > 0)
    def _():
        src = comm.at[s - 1]

        @pl.when(gg == 0)
        def _():
            stage_cp(src, 0, 0).start()

        @pl.when(gg + 1 < n_gg)
        def _():
            stage_cp(src, gg + 1, (gg + 1) % 2).start()

        stage_cp(src, gg, gg % 2).wait()

    @pl.when((s == 0) & (gg == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pack = pack_ref[0].astype(jnp.int32)
    acc = out_ref[:]
    for b, plane in _planes(pack, cdtype):
        blk = stage[gg % 2, b * 128 : (b + 1) * 128, :]
        acc += jnp.dot(plane, blk, preferred_element_type=_acc_dtype(cdtype))
    out_ref[:] = acc

    last = (
        (rb == pl.num_programs(0) - 1)
        & (s == pl.num_programs(1) - 1)
        & (gg == pl.num_programs(2) - 1)
    )

    @pl.when(last)
    def _():
        _drain_sends(comm, send_sem, recv_sem, left, parts)


def ring_pattern_fwd(
    pack_local: jax.Array,  # i32 (P, m, m//32) ring-ordered fwd pattern tiles
    bf: jax.Array,  # (d_pad, m) feature-major own block (compute dtype)
    parts: int,
    axis_name: str = "graph",
    interpret: bool = False,
) -> jax.Array:
    """Per-device fused forward: Cf = sum_s Bf_{k_s} @ planes(pack[s])."""
    d_pad, m = bf.shape
    cdtype = bf.dtype
    n_g, n_cb = m // GROUP, m // J_FWD
    return pl.pallas_call(
        functools.partial(
            _fwd_ring_kernel,
            parts=parts,
            n_cb=n_cb,
            axis_name=axis_name,
            cdtype=cdtype,
        ),
        grid=(n_g, parts, n_cb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, J_FWD, 128), lambda g, s, cb: (s, cb, g), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (d_pad, GROUP), lambda g, s, cb: (0, g), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d_pad, m), _acc_dtype(cdtype)),
        scratch_shapes=[
            pltpu.HBM((max(parts - 1, 1), d_pad, m), cdtype),
            pltpu.VMEM((2, d_pad, J_FWD), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((max(parts - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(parts - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=1),
        interpret=_interp(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * parts * m * m * d_pad,
            bytes_accessed=pack_local.size * 4 + bf.size * 4 * n_g * parts,
            transcendentals=0,
        ),
    )(bf, pack_local)


def ring_pattern_bwd(
    pack_local: jax.Array,  # i32 (P, m, m//32) ring-ordered bwd pattern tiles
    g0: jax.Array,  # (m, d_pad) row-major own (pre-scaled) gradient block
    parts: int,
    axis_name: str = "graph",
    interpret: bool = False,
) -> jax.Array:
    """Per-device fused backward: C = sum_s planes(pack[s]) @ G_{k_s}."""
    m, d_pad = g0.shape
    cdtype = g0.dtype
    n_rb, n_gg = m // O_BWD, m // GROUP
    return pl.pallas_call(
        functools.partial(
            _bwd_ring_kernel,
            parts=parts,
            n_gg=n_gg,
            axis_name=axis_name,
            cdtype=cdtype,
        ),
        grid=(n_rb, parts, n_gg),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, O_BWD, 128), lambda rb, s, gg: (s, rb, gg), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (O_BWD, d_pad), lambda rb, s, gg: (rb, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m, d_pad), _acc_dtype(cdtype)),
        scratch_shapes=[
            pltpu.HBM((max(parts - 1, 1), m, d_pad), cdtype),
            pltpu.VMEM((2, GROUP, d_pad), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((max(parts - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(parts - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(collective_id=2),
        interpret=_interp(interpret),
        cost_estimate=pl.CostEstimate(
            flops=2 * parts * m * m * d_pad,
            bytes_accessed=pack_local.size * 4 + g0.size * 4 * n_rb * parts,
            transcendentals=0,
        ),
    )(g0, pack_local)
