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


def test_compact_line_fits_driver_tail(tmp_path):
    """Round-4 regression: the all-keys output line outgrew the driver's
    ~2 KB tail capture and BENCH_r04.json recorded `parsed: null`. The
    stdout line must stay under the budget no matter how many keys the
    full result carries, while the headline keys survive the trim and the
    full dict lands in bench_results.json."""
    out = _run(f"""
        import sys; sys.path.insert(0, {REPO!r})
        import bench, os
        os.chdir({str(REPO)!r})
        result = {{
            "metric": "augmented images/sec/chip at 224px",
            "value": 94697.0, "unit": "images/sec", "vs_baseline": 172.2,
            "serving_img_per_sec": 251.7, "mfu_pct_leafcnn_b32": 9.5,
            "north_star_e2e_s": 180.0,
        }}
        result.update({{f"extra_key_number_{{i}}": 123.456789 for i in range(200)}})
        bench.emit_final(result)
    """)
    line = json.dumps(out)
    assert len(line) <= 1500
    for k in ("metric", "value", "vs_baseline", "serving_img_per_sec",
              "mfu_pct_leafcnn_b32", "north_star_e2e_s"):
        assert k in out, f"headline key {k} trimmed from compact line"
    assert not any(k.startswith("extra_key") for k in out)
    full = json.loads(open(f"{REPO}/bench_results.json").read())
    assert full["extra_key_number_199"] == 123.456789


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
