"""Unit tests for bench.py's publish-side helpers (no TPU, no harvest)."""
import json
import os
import subprocess
import sys

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_merge_chip_ab_full_fresh_wins():
    fresh = {"chip_side_forward_img_per_s": 177.7,
             "chip_side_packed_forward_img_per_s": 133.8,
             "measured_at": "2026-08-19T16:00:00"}
    cached = {"chip_side_forward_img_per_s": 150.0,
              "chip_side_packed_forward_img_per_s": 120.0,
              "measured_at": "2026-08-19T10:00:00"}
    out = bench._merge_chip_ab(fresh, cached)
    assert out["chip_side_forward_img_per_s"] == 177.7
    assert out["chip_side_packed_forward_img_per_s"] == 133.8
    assert out["chip_ab_source"] == "measured_this_run"


def test_merge_chip_ab_backfills_budget_skipped_rate():
    # budget allowed only the packed section: the unpacked rate must come from
    # the in-round persisted measurement, never publish as null
    fresh = {"chip_side_packed_forward_img_per_s": 133.8,
             "measured_at": "2026-08-19T16:00:00"}
    cached = {"chip_side_forward_img_per_s": 177.5,
              "chip_side_packed_forward_img_per_s": 133.6,
              "measured_at": "2026-08-19T10:00:00"}
    out = bench._merge_chip_ab(fresh, cached)
    assert out["chip_side_forward_img_per_s"] == 177.5  # backfilled
    assert out["chip_side_packed_forward_img_per_s"] == 133.8  # fresh wins
    assert out["chip_ab_source"] == "measured_this_run+cached_2026-08-19T10:00:00"
    assert out["measured_at"] == "2026-08-19T16:00:00"


def test_merge_chip_ab_partial_fresh_empty_cache():
    fresh = {"chip_side_packed_forward_img_per_s": 133.8,
             "measured_at": "2026-08-19T16:00:00"}
    out = bench._merge_chip_ab(fresh, {})
    assert "chip_side_forward_img_per_s" not in out
    assert out["chip_ab_source"] == "measured_this_run"


def test_watchdog_prefers_staged_pending_result():
    # a wedge in the post-harvest chip-A/B stage must publish the COMPLETE staged
    # result (flagged), never the skeleton fallback that drops the ledger/anchor
    script = """
import bench, sys, time
bench.PROGRESS["pending_result"] = {
    "metric": "dissect_images_per_sec_per_chip", "value": 49.46,
    "unit": "img/s/chip", "vs_baseline": 11.87,
    "detail": {"rate_to_2048_img_per_s": 54.72, "setup_ledger": {"pool_s": 1.0}}}
bench.PROGRESS["stage"] = "chip_ab"
bench._start_watchdog(time.monotonic() - bench.T_PROC + 6.0)
time.sleep(30)  # simulated GIL-free wedge: the watchdog must fire and _exit(3)
"""
    r = subprocess.run([sys.executable, "-c", script], cwd=REPO,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 3
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 49.46
    assert out["detail"]["post_harvest_timeout"] is True
    assert out["detail"]["stage_at_timeout"] == "chip_ab"
    assert out["detail"]["rate_to_2048_img_per_s"] == 54.72  # nothing dropped


def test_crash_handler_prefers_staged_pending_result():
    script = """
import bench
def boom():
    bench.PROGRESS["pending_result"] = {
        "metric": "dissect_images_per_sec_per_chip", "value": 42.21,
        "unit": "img/s/chip", "vs_baseline": 10.13, "detail": {}}
    raise RuntimeError("decoration stage crashed")
bench.main = boom
bench.run_main()
"""
    r = subprocess.run([sys.executable, "-c", script], cwd=REPO,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 4
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 42.21
    assert "decoration stage crashed" in out["detail"]["post_harvest_error"]


def test_crash_handler_skeleton_without_pending():
    script = """
import bench
def boom():
    raise RuntimeError("early crash")
bench.main = boom
bench.run_main()
"""
    r = subprocess.run([sys.executable, "-c", script], cwd=REPO,
                       capture_output=True, text=True, timeout=60)
    assert r.returncode == 4
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["value"] == 0.0
    assert "early crash" in out["detail"]["error"]


def test_process_watchdog_helper_prefers_pending_result(tmp_path):
    # the subprocess (GIL-independent) watchdog reads the status snapshot: a staged
    # pending_result must be published verbatim with the process_watchdog flag
    status = tmp_path / "status.json"
    status.write_text(json.dumps({
        "stage": "chip_ab", "n_images": 10000, "cum_rate_img_per_s": 49.5,
        "pending_result": {"metric": "dissect_images_per_sec_per_chip",
                           "value": 49.46, "unit": "img/s/chip",
                           "vs_baseline": 11.87, "detail": {}}}))
    sentinel = tmp_path / "never.printed"
    victim = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(120)"])
    try:
        r = subprocess.run(
            [sys.executable, "-c", bench._PROC_WATCHDOG_HELPER, "0.1",
             str(sentinel), str(status), str(victim.pid), "4.17"],
            capture_output=True, text=True, timeout=60)
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["value"] == 49.46
        assert out["detail"]["process_watchdog"] is True
        assert out["detail"]["post_harvest_timeout"] is True
        assert out["detail"]["stage_at_timeout"] == "chip_ab"
        assert victim.wait(timeout=30) != 0  # helper SIGKILLs the wedged parent
    finally:
        if victim.poll() is None:
            victim.kill()


def test_process_watchdog_helper_skeleton_without_pending(tmp_path):
    status = tmp_path / "status.json"
    status.write_text(json.dumps({"stage": "harvest", "n_images": 896,
                                  "cum_rate_img_per_s": 16.22}))
    sentinel = tmp_path / "never.printed"
    victim = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(120)"])
    try:
        r = subprocess.run(
            [sys.executable, "-c", bench._PROC_WATCHDOG_HELPER, "0.1",
             str(sentinel), str(status), str(victim.pid), "4.17"],
            capture_output=True, text=True, timeout=60)
        out = json.loads(r.stdout.strip().splitlines()[-1])
        assert out["value"] == 16.22
        assert out["detail"]["process_watchdog"] is True
        assert out["detail"]["n_images_measured"] == 896
    finally:
        if victim.poll() is None:
            victim.kill()


def test_native_so_symbol_check(tmp_path):
    from mammodissect import native

    stale = tmp_path / "stale.so"
    stale.write_bytes(b"\x7fELF fi_resize_normalize only")
    assert not native._so_has_symbols(str(stale))
    # a .so with every entry-point NAME but a pre-v2 ABI (fi_batch_pack kept
    # its name when compute_spans was dropped) must also be rejected
    old_abi = tmp_path / "old_abi.so"
    old_abi.write_bytes(b"\x7fELF " + " ".join(
        s for s in native._REQUIRED_SYMBOLS if not s.startswith("fi_abi")
    ).encode())
    assert not native._so_has_symbols(str(old_abi))
    if native.available():
        assert native._so_has_symbols(native._SO)
