"""Compatibility shims for the pinned jax version.

jax 0.9.0's ``ppermute``/``pshuffle`` lowering is broken inside
``shard_map``: ``_pcollectives_lowering_common`` derives replica groups from
``module_context.axis_env`` (the pmap-era replica env), which is empty under
shard_map's manual-mesh lowering — every source/destination collapses to 0
and the lowering raises "sources and destinations must be unique". The mesh
axis sizes are, however, available from the core axis env that shard_map
extends around lowering.

:func:`install` wraps the helper: when the replica env doesn't know the axis
but the core env does (the shard_map case), emit the collective-permute pairs
directly as logical positions along the manual axis. Correctness is pinned by
tests/test_dist.py's exact comparisons between the ring-permute path and the
single-device path.
"""

from __future__ import annotations

import numpy as np

_installed = False


def install() -> None:
    global _installed
    if _installed:
        return
    _installed = True

    import jax._src.core as jcore
    import jax._src.lax.parallel as par
    from jax._src.interpreters import mlir
    from jax._src.lib.mlir.dialects import hlo
    from jax._src.sharding_impls import SPMDAxisContext

    orig = par._pcollectives_lowering_common

    def patched(ctx, *, axis_name, perm, op_name):
        names = axis_name if isinstance(axis_name, (list, tuple)) else (axis_name,)
        core_env = jcore.get_axis_env()
        known = getattr(core_env, "axis_sizes", {})
        try:
            return orig(ctx, axis_name=axis_name, perm=perm, op_name=op_name)
        except ValueError:
            # The replica env collapsed the axis (shard_map manual lowering);
            # rebuild the pairs from the core env's true axis size.
            if not all(n in known for n in names):
                raise
        full_perm = np.asarray(perm, dtype=np.int64).reshape(-1, 2)
        axis_context = ctx.module_context.axis_context
        is_manual = (
            isinstance(axis_context, SPMDAxisContext) and axis_context.manual_axes
        )
        if is_manual:
            other = dict(
                channel_handle=hlo.ChannelHandle.get(
                    mlir.COLLECTIVE_CHANNEL_ID, mlir.DEVICE_TO_DEVICE_TYPE
                )
            )
        else:
            other = {}
        return full_perm, other

    par._pcollectives_lowering_common = patched
