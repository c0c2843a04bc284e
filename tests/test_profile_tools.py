"""Unit tests for tools/profile_step.py's xplane parsing — the op-level and
category-level aggregation that every recorded MFU/profile claim in
PARITY.md flows through. Builds a synthetic XSpace proto instead of needing
a TPU trace."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pytest.importorskip("tensorflow.tsl.profiler.protobuf.xplane_pb2")

from tensorflow.tsl.profiler.protobuf import xplane_pb2  # noqa: E402

from tools.profile_step import analyze, analyze_categories  # noqa: E402


def _write_trace(tmp_path, plane_name="TPU:0 (device)"):
    """One device plane, one 'XLA Ops' line: two fusions (same category),
    a convert, and a while wrapper (double-counts its body)."""
    space = xplane_pb2.XSpace()
    plane = space.planes.add()
    plane.name = plane_name
    for mid, name in [
        (1, "%fusion.123 = fusion(...)"),
        (2, "%fusion.45 = fusion(...)"),
        (3, "%convert.7 = convert(...)"),
        (4, "%while.2 = while(...)"),
    ]:
        plane.event_metadata[mid].id = mid
        plane.event_metadata[mid].name = name
    line = plane.lines.add()
    line.name = "XLA Ops"
    for mid, ps in [(1, 3_000_000_000), (2, 2_000_000_000),
                    (3, 1_000_000_000), (4, 6_000_000_000)]:
        ev = line.events.add()
        ev.metadata_id = mid
        ev.duration_ps = ps
    sub = tmp_path / "plugins" / "profile"
    sub.mkdir(parents=True)
    with open(sub / "host.xplane.pb", "wb") as f:
        f.write(space.SerializeToString())
    return str(tmp_path)


def test_analyze_categories_collapses_and_skips_while(tmp_path, capsys):
    analyze_categories(_write_trace(tmp_path))
    out = capsys.readouterr().out
    # fusion.123 + fusion.45 collapse into one 5 ms category at 5/6 of the
    # body total; the while wrapper (which double-counts its body) is skipped
    assert "body total 6.0 ms" in out
    lines = {l.split()[-1]: l for l in out.splitlines() if " ms " in l}
    assert "5.000 ms" in lines["fusion"] and "83.3%" in lines["fusion"]
    assert "1.000 ms" in lines["convert"] and "16.7%" in lines["convert"]
    assert "while" not in lines


def test_analyze_lists_per_op_names(tmp_path, capsys):
    analyze(_write_trace(tmp_path))
    out = capsys.readouterr().out
    # per-op view keeps individual names (incl. the while wrapper) and
    # totals all four events: 12 ms
    assert "total 12.00 ms" in out
    assert "%fusion.123 = fusion(...)" in out
    assert "%while.2 = while(...)" in out


def test_non_device_planes_are_ignored(tmp_path, capsys):
    analyze_categories(_write_trace(tmp_path, plane_name="/host:CPU python"))
    out = capsys.readouterr().out
    assert "no device 'XLA Ops' events" in out


def test_missing_trace_dir_message(tmp_path, capsys):
    analyze_categories(str(tmp_path))
    assert "no xplane.pb found" in capsys.readouterr().out
