"""tools/bench_inference.py end-to-end smoke on CPU (tiny batch, 2 iters).

Covers both timing cadences — readback-per-call and the pipelined
(double-buffered) loop — so refactors of the serving bench can't silently
break the measurement loop itself. Timing values are not asserted (CPU);
only the contract: one result line per batch with both cadences reported.
"""

import os
import sys

import pytest


def test_bench_inference_prints_both_cadences(capsys):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.bench_inference import main

    main(["--batches", "2", "--iters", "2"])
    out = capsys.readouterr().out.strip().splitlines()
    lines = [l for l in out if "stories" in l]
    assert len(lines) == 1, out
    line = lines[0]
    assert "ms/call" in line and "frames/s" in line
    assert "pipelined" in line
    # both throughput figures parse as positive numbers
    import re

    fps = [float(x) for x in re.findall(r"(\d+)\s+frames/s", line)]
    assert len(fps) == 2 and all(f > 0 for f in fps), line
