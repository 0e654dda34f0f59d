"""xplane reader tests: hand-encoded protobuf fixture + CLI fallback.

The fused-epoch ``--time-phases`` path (diagnostics.profile_fused_step)
reduces jax.profiler device traces via mg_gcn_tpu.xplane; this test encodes
a miniature XSpace in raw wire format and checks scope attribution,
including events XLA merged across scopes (credited to the surviving op's
scope) and unattributed ops.
"""

import os

import pytest

from mg_gcn_tpu.xplane import device_time_by_scope, _looks_like_phase


def _varint(x: int) -> bytes:
    out = b""
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fn: int, wt: int, payload) -> bytes:
    key = _varint((fn << 3) | wt)
    if wt == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _stat(metadata_id: int, s: str) -> bytes:
    return _field(1, 0, metadata_id) + _field(5, 2, s.encode())


def _event_meta(mid: int, name: str, scope: str | None) -> bytes:
    body = _field(1, 0, mid) + _field(2, 2, name.encode())
    if scope:
        body += _field(5, 2, _stat(7, scope))
    return _field(2, 2, body)  # map value


def _map_entry(k: int, meta: bytes) -> bytes:
    return _field(1, 0, k) + meta


def _event(mid: int, dur_ps: int) -> bytes:
    return _field(1, 0, mid) + _field(3, 0, dur_ps)


def make_xspace(tmp_path) -> str:
    # plane "/device:TPU:0" with line "XLA Ops" and three ops
    events = (
        _field(4, 2, _event(1, 2_000_000_000))  # 2 ms -> 0_0_matmul-spmm
        + _field(4, 2, _event(1, 1_000_000_000))  # +1 ms same op
        + _field(4, 2, _event(2, 500_000_000))  # 0.5 ms -> adam-update
        + _field(4, 2, _event(3, 250_000_000))  # 0.25 ms unattributed
    )
    line = _field(2, 2, b"XLA Ops") + events
    metas = (
        _field(
            4,
            2,
            _map_entry(1, _event_meta(1, "fusion.1", "jit(step)/0_0_matmul-spmm/dot:")),
        )
        + _field(
            4, 2, _map_entry(2, _event_meta(2, "fusion.2", "jit(step)/adam-update/add:"))
        )
        + _field(4, 2, _map_entry(3, _event_meta(3, "copy.3", None)))
    )
    plane = _field(2, 2, b"/device:TPU:0") + _field(3, 2, line) + metas
    # a host plane that must be ignored
    host_plane = _field(2, 2, b"/host:CPU") + _field(
        3, 2, _field(2, 2, b"XLA Ops") + _field(4, 2, _event(9, 10**12))
    )
    space = _field(1, 2, plane) + _field(1, 2, host_plane)
    d = tmp_path / "plugins" / "profile" / "run1"
    os.makedirs(d)
    path = d / "host.xplane.pb"
    path.write_bytes(space)
    return str(tmp_path)


def test_device_time_by_scope(tmp_path):
    trace_dir = make_xspace(tmp_path)
    totals = device_time_by_scope(trace_dir)
    assert abs(totals["0_0_matmul-spmm"] - 3.0) < 1e-9
    assert abs(totals["adam-update"] - 0.5) < 1e-9
    assert abs(totals["unattributed"] - 0.25) < 1e-9
    assert len(totals) == 3  # host plane ignored


def test_empty_dir(tmp_path):
    assert device_time_by_scope(str(tmp_path)) == {}


def test_phase_key_matcher():
    assert _looks_like_phase("0_0_matmul-spmm")
    assert _looks_like_phase("12_1_activation")
    assert _looks_like_phase("3_loss-layer")
    assert _looks_like_phase("adam-update")
    assert not _looks_like_phase("jit(step)")
    assert not _looks_like_phase("transpose")
    assert not _looks_like_phase("0_2_matmul-gemm")


@pytest.mark.slow
def test_cli_time_phases_cpu_fallback(tmp_path):
    # on the CPU backend there is no "/device:" plane: the CLI must fall
    # back to the un-fused replay and still write phase_ rows
    from tests.test_cli import run_cli

    toy = "/root/reference/test/data/toyA"
    if not os.path.isdir(toy):
        import pytest

        pytest.skip("toy data missing")
    r = run_cli(["-E", "1", "--time-phases", "train", toy, "1", "8"], cwd=tmp_path)
    assert r.returncode == 0, r.stderr
    csvs = list((tmp_path / "csvs").iterdir())
    assert csvs
    content = csvs[0].read_text()
    assert "phase_" in content
