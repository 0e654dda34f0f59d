"""Minimal XSpace/XPlane protobuf reader (no tensorflow dependency).

``jax.profiler.trace`` writes ``*.xplane.pb`` files whose device planes
carry per-HLO-op events with durations and, in each op's stats, the XLA
``op_name`` — which includes the ``jax.named_scope`` path (e.g.
``jit(step)/0_0_matmul-spmm/...``). This module decodes just enough of the
protobuf wire format to aggregate device time per scope label, powering the
fused-epoch ``--time-phases`` breakdown (the reference's CUDA-event
``epoch_gpu_phase`` CSV, matrix.hpp:107-157) without de-fusing the step.

Wire schema (tsl/profiler/protobuf/xplane.proto):
  XSpace.planes = 1;  XPlane.name = 2, .lines = 3, .event_metadata = 4
  (map<int64, XEventMetadata>), .stat_metadata = 5;
  XLine.name = 2, .events = 4;  XEvent.metadata_id = 1, .duration_ps = 3,
  .stats = 4;  XEventMetadata.id = 1, .name = 2, .stats = 5;
  XStat.metadata_id = 1, .str_value = 5;  XStatMetadata.id = 1, .name = 2.
"""

from __future__ import annotations

import glob
import os
from collections import defaultdict


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    x = 0
    s = 0
    while True:
        b = buf[i]
        i += 1
        x |= (b & 0x7F) << s
        if not b & 0x80:
            return x, i
        s += 7


def _fields(buf: bytes):
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        fn, wt = key >> 3, key & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wt == 5:
            v = int.from_bytes(buf[i : i + 4], "little")
            i += 4
        elif wt == 1:
            v = int.from_bytes(buf[i : i + 8], "little")
            i += 8
        else:  # pragma: no cover - unused wire types
            raise ValueError(f"unsupported wire type {wt}")
        yield fn, wt, v


def _parse_stat(pb: bytes) -> tuple[int | None, str | None]:
    mid = None
    sval = None
    for fn, wt, v in _fields(pb):
        if fn == 1 and wt == 0:
            mid = v
        elif fn == 5 and wt == 2:
            sval = v.decode("utf-8", "replace")
    return mid, sval


def _parse_map_entry(pb: bytes) -> tuple[int | None, bytes | None]:
    k = None
    val = None
    for fn, wt, v in _fields(pb):
        if fn == 1 and wt == 0:
            k = v
        elif fn == 2 and wt == 2:
            val = v
    return k, val


def device_time_by_scope(trace_dir: str, device_prefix: str = "/device:") -> dict[str, float]:
    """Aggregate 'XLA Ops' device time (ms) keyed by named-scope component.

    Returns {scope_component: milliseconds} summed over every event whose
    op_name path contains that component, for every plane whose name starts
    with ``device_prefix`` (excluding the Megascale CUSTOM plane). Events
    with no scope component land under ``"unattributed"``.
    """
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        return {}
    buf = open(paths[-1], "rb").read()
    totals: dict[str, float] = defaultdict(float)
    for fn, wt, plane_pb in _fields(buf):
        if fn != 1 or wt != 2:
            continue
        name = None
        lines = []
        emeta_raw = {}
        smeta = {}
        for fn2, wt2, v2 in _fields(plane_pb):
            if fn2 == 2 and wt2 == 2:
                name = v2.decode()
            elif fn2 == 3 and wt2 == 2:
                lines.append(v2)
            elif fn2 == 4 and wt2 == 2:
                k, val = _parse_map_entry(v2)
                if k is not None and val is not None:
                    emeta_raw[k] = val
            elif fn2 == 5 and wt2 == 2:
                k, val = _parse_map_entry(v2)
                if k is not None and val is not None:
                    mname = None
                    for fn3, wt3, v3 in _fields(val):
                        if fn3 == 2 and wt3 == 2:
                            mname = v3.decode()
                    smeta[k] = mname
        if not name or not name.startswith(device_prefix) or "CUSTOM" in name:
            continue
        # op metadata id -> scope path (from the 'tf_op'-style op_name stat)
        op_name_of = {}
        for mid, meta_pb in emeta_raw.items():
            scope = None
            for fn3, wt3, v3 in _fields(meta_pb):
                if fn3 == 5 and wt3 == 2:  # XEventMetadata.stats
                    sid, sval = _parse_stat(v3)
                    if sval and "/" in sval:
                        scope = sval
            op_name_of[mid] = scope
        for line_pb in lines:
            lname = None
            events = []
            for fn3, wt3, v3 in _fields(line_pb):
                if fn3 == 2 and wt3 == 2:
                    lname = v3.decode()
                elif fn3 == 4 and wt3 == 2:
                    events.append(v3)
            if lname != "XLA Ops":
                continue
            for epb in events:
                mid = None
                dur_ps = 0
                for fn4, wt4, v4 in _fields(epb):
                    if fn4 == 1 and wt4 == 0:
                        mid = v4
                    elif fn4 == 3 and wt4 == 0:
                        dur_ps = v4
                scope = op_name_of.get(mid)
                ms = dur_ps / 1e9
                if scope:
                    # op_name like "jit(step)/0_0_matmul-spmm/...:suffix" —
                    # credit every path component (phases do not nest)
                    comps = [c.rstrip(":") for c in scope.split("/")]
                    hit = False
                    for c in comps:
                        if _looks_like_phase(c):
                            totals[c] += ms
                            hit = True
                            break
                    if not hit:
                        totals["unattributed"] += ms
                else:
                    totals["unattributed"] += ms
    return dict(totals)


def _looks_like_phase(comp: str) -> bool:
    """Phase keys follow the reference timer naming (gcn.hpp register_timer):
    '<layer>_<0|1>_<op>', '<L>_loss-layer', 'adam-update'."""
    if comp == "adam-update" or comp.endswith("_loss-layer"):
        return True
    parts = comp.split("_")
    return (
        len(parts) == 3
        and parts[0].isdigit()
        and parts[1] in ("0", "1")
        and parts[2] in ("matmul-gemm", "matmul-spmm", "activation", "residual")
    )
