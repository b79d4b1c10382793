"""bench_compare.py is round-close tooling — a parse regression there
would silently break the normalized-delta story the changelog quotes."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench_compare import _load  # noqa: E402


def _write(tmp_path, name, obj, oneline=False):
    p = tmp_path / name
    p.write_text(json.dumps(obj) if oneline else json.dumps(obj, indent=1))
    return str(p)


def test_load_handles_raw_and_driver_wrapped(tmp_path):
    raw = {"queries": {"q1": 1.0}, "calibration": {"cpu": 0.1}}
    wrapped = {"n": 1, "parsed": raw}
    assert _load(_write(tmp_path, "raw.json", raw, oneline=True)) == raw
    assert _load(_write(tmp_path, "wrapped.json", wrapped)) == raw


def test_load_takes_last_line_of_noisy_stdout(tmp_path):
    raw = {"queries": {"q1": 2.0}}
    p = tmp_path / "noisy.json"
    p.write_text("[Stage 1:>  (0 + 1) / 1]\n" + json.dumps(raw))
    assert _load(str(p)) == raw


def test_main_normalizes_by_calibration(tmp_path, capsys, monkeypatch):
    from bench_compare import main

    old = {"queries": {"q1": 1.0, "q2": 2.0},
           "calibration": {"cpu": 0.1, "scan": 0.2}}
    # host 2x slower, queries 2x slower -> normalized ratio 1.0
    new = {"queries": {"q1": 2.0, "q2": 4.0},
           "calibration": {"cpu": 0.2, "scan": 0.4}}
    monkeypatch.setattr(sys, "argv", [
        "bench_compare.py",
        _write(tmp_path, "old.json", old),
        _write(tmp_path, "new.json", new),
    ])
    assert main() == 0
    out = capsys.readouterr().out
    assert "host-shift factor (median calibration ratio): 2.000" in out
    assert "median NORMALIZED ratio: 1.000" in out
