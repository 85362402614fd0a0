"""Run the TPU-marked test suite on the real chip and write the round
evidence artifact TPU_TESTS_r5.json (VERDICT r4 task 6; format follows
TPU_TESTS_r3.json so the judge can diff rounds).

Runs pytest programmatically with a collecting plugin so pass/fail
counts and test ids are exact, not parsed from text.
"""

import json
import os
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# `python scripts/run_tpu_tests.py` puts scripts/ (not the repo root) on
# sys.path, and in-process pytest.main inherits it — the test modules
# then can't import materialist_tpu
if REPO not in sys.path:
    sys.path.insert(0, REPO)


class Collector:
    def __init__(self):
        self.passed = []
        self.failed = []
        self.skipped = []

    def pytest_runtest_logreport(self, report):
        if report.when != "call" and not (report.skipped and
                                          report.when == "setup"):
            return
        if report.passed:
            self.passed.append(report.nodeid)
        elif report.failed:
            self.failed.append(report.nodeid)
        elif report.skipped:
            self.skipped.append(report.nodeid)


def main():
    os.environ["MATERIALIST_TPU_TESTS"] = "1"
    os.chdir(REPO)
    col = Collector()
    t0 = time.time()
    rc = pytest.main(["tests/", "-m", "tpu", "-q", "-rA"], plugins=[col])
    dur = time.time() - t0
    artifact = {
        "round": 5,
        "date": time.strftime("%Y-%m-%d"),
        "command": "MATERIALIST_TPU_TESTS=1 python -m pytest tests/ -m tpu -q",
        "passed": len(col.passed),
        "failed": len(col.failed),
        "skipped": len(col.skipped),
        "duration_s": round(dur, 2),
        "tests": col.passed + [f"FAILED::{t}" for t in col.failed],
        "note": ("run on the real TPU v5e chip via the axon tunnel; "
                 "VERDICT r4 task 6 artifact"),
    }
    with open(os.path.join(REPO, "TPU_TESTS_r5.json"), "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"[tpu-tests] passed={artifact['passed']} "
          f"failed={artifact['failed']} dur={dur:.1f}s rc={rc}")
    return 0 if rc == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
