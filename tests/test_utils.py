"""Tests for profiling and distributed utilities."""

import time

from instagraal_tpu.utils import PhaseTimer, init_distributed, is_coordinator


class TestPhaseTimer:
    def test_accumulates(self):
        t = PhaseTimer()
        with t.phase("a"):
            time.sleep(0.01)
        with t.phase("a"):
            pass
        with t.phase("b"):
            pass
        assert t.counts["a"] == 2
        assert t.totals["a"] >= 0.01
        report = t.report(log=False)
        assert "a" in report and "b" in report
        d = t.as_dict()
        assert d["a"]["calls"] == 2


class TestDistributed:
    def test_single_process_noop(self):
        init_distributed()  # must not raise without a coordinator
        assert is_coordinator()
