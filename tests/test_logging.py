"""Logging/observability unit tests."""

import os
import time

from semiuhpe_tpu.training.loggingx import CsvTable, TextLogger, Throughput
from semiuhpe_tpu.training.profiling import StepTimer


class TestTextLogger:
    def test_log_format(self, tmp_path):
        lg = TextLogger(str(tmp_path))
        lg.log("train", 100, {"loss": 1.5, "err_deg": 10.0})
        lg.line("hello")
        content = open(lg.path).read()
        assert "train iter:100 loss:1.500000, err_deg:10.000000" in content
        assert "hello" in content


class TestCsvTable:
    def test_append_and_header_merge(self, tmp_path):
        path = str(tmp_path / "t.csv")
        t = CsvTable(path)
        t.write({"name": "a", "acc": 1.0})
        t.write({"name": "b", "acc": 2.0, "extra": 3})
        rows = open(path).read().splitlines()
        assert rows[0].startswith("name,acc")
        assert len(rows) == 3


class TestMeters:
    def test_throughput_rate(self):
        m = Throughput(window=1)
        m.tick(10)
        time.sleep(0.05)
        rate = m.tick(10)
        assert 50 < rate < 1000

    def test_step_timer_summary(self):
        t = StepTimer()
        for _ in range(3):
            t.start()
            time.sleep(0.01)
            t.stop()
        s = t.summary()
        assert s["steps"] == 3
        assert 5 < s["p50_ms"] < 100
