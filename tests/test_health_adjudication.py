"""The bench health probe's decision logic (bench.adjudicate_health).

Round-5 regression: every ratio-healthy probe recorded through round 5 was
a contention artifact — an external load starved the 2-core leg (0.40-0.68
M rows/s vs a 101-probe median of 1.63), inflating the ratio while the
8-core leg stayed pinned at the ~2 M rows/s bandwidth ceiling. The floor
clause must reject exactly those windows and keep genuinely-healthy ones.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import adjudicate_health


class TestAdjudicateHealth:
    def test_genuinely_healthy_window(self):
        # uncontended lo (≥ floor) and a real core-span ratio
        out = adjudicate_health(1.5, 5.1, 2, 8)
        assert out["healthy"] is True
        assert out["contention_suspect"] is False
        assert out["ratio_2_to_8"] == 3.4

    def test_saturated_host_rejected_by_ratio(self):
        # the classic round-2..4 signature: 8 cores no faster than 2
        out = adjudicate_health(1.6, 1.8, 2, 8)
        assert out["healthy"] is False
        assert out["contention_suspect"] is False

    def test_contention_false_positive_rejected(self):
        # the three recorded round-5 "healthy" probes: lo starved by an
        # external load, hi pinned at the ceiling, ratio inflated past the
        # span threshold — must now be rejected and flagged
        for lo, hi in [(0.68, 2.05), (0.40, 1.81), (0.56, 1.90)]:
            out = adjudicate_health(lo, hi, 2, 8)
            assert out["ratio_2_to_8"] >= out["healthy_threshold"]
            assert out["healthy"] is False
            assert out["contention_suspect"] is True

    def test_span_follows_actual_core_pair(self):
        # on a CPUS=4 host the high leg runs at 4 cores: threshold 0.6*2
        out = adjudicate_health(1.5, 1.9, 2, 4)
        assert out["healthy_threshold"] == 1.2
        assert out["healthy"] is True  # 1.27 ratio ≥ 1.2, lo above floor

    def test_floor_env_override(self):
        os.environ["SPARK_GRAFT_HEALTH_LO_FLOOR"] = "0.3"
        try:
            out = adjudicate_health(0.4, 1.81, 2, 8)
            assert out["healthy"] is True
        finally:
            del os.environ["SPARK_GRAFT_HEALTH_LO_FLOOR"]
