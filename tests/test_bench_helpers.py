"""Unit tests for bench.py's publish-side helpers (no TPU, no harvest)."""
import bench


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
