"""Bench-harness failure-mode tests: the driver runs `bench.py` unattended
on a relay-tunneled TPU that goes dark for minutes at a time, so the harness
must ALWAYS print one parseable JSON line — the watchdog (mid-run outage)
and the start-up probe (outage before the first op) both guarantee it.
Run in subprocesses: both paths end in os._exit by design."""

import json
import subprocess
import sys
import textwrap

REPO = "/root/repo"


def _run(code: str) -> dict:
    r = subprocess.run([sys.executable, "-c", textwrap.dedent(code)],
                       capture_output=True, text=True, timeout=120)
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in stdout: {r.stdout!r} / {r.stderr!r}"
    return json.loads(lines[-1])


def test_watchdog_emits_partial_json():
    out = _run(f"""
        import sys; sys.path.insert(0, {REPO!r})
        import bench
        bench._partial["e2e_img_per_sec"] = 12.5   # a section completed
        bench._arm_watchdog(0.5)
        import time; time.sleep(60)
    """)
    assert out["metric"] == "augmented images/sec/chip at 224px"
    assert "error" in out and "partial" in out["error"]
    assert out["e2e_img_per_sec"] == 12.5  # completed sections survive


def test_unreachable_device_emits_error_json():
    # probe never answers (patched to block) -> error JSON, not a hang
    out = _run(f"""
        import sys; sys.path.insert(0, {REPO!r})
        import bench
        bench._await_device = lambda *a, **k: False
        bench.main()
    """)
    assert out["value"] == 0.0
    assert "unreachable" in out["error"]
