"""Worker-heuristic parity (`srcs/utils/system_info.py:37-46`) and the
meta.json system block schema."""

import leaffliction_tpu.core.sysinfo as sysinfo


def test_worker_heuristic_matches_reference(monkeypatch):
    cases = {1: 1, 2: 1, 3: 2, 4: 3, 8: 6, 16: 12, 64: 48}
    for cores, expect in cases.items():
        monkeypatch.setattr(sysinfo, "get_cpu_count", lambda c=cores: c)
        assert sysinfo.get_optimal_worker_count() == expect, cores


def test_system_info_schema():
    info = sysinfo.get_system_info()
    for key in ("platform", "python_version", "processor", "cpu_count",
                "backend", "device_count"):
        assert key in info, key
    assert info["cpu_count"] >= 1
