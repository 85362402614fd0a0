"""Profiling/observability utility tests."""

import json
import time

from materialist_tpu.utils.profiling import JsonlLogger, PhaseTimer


def test_phase_timer_accumulates():
    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.02
    rep = t.report()
    assert "a:" in rep and "2x" in rep


def test_jsonl_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = JsonlLogger(p)
    log.log(loss=0.5, epoch=1)
    log.log(loss=0.25, epoch=2)
    log.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["loss"] == 0.5 and lines[1]["epoch"] == 2
    # disabled logger is a no-op
    JsonlLogger(None).log(x=1)
