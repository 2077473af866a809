"""The validation harness itself: every device path must be FORCED to
execute and reported under its own key (round-2 hole: '--kernel compact'
could be silently routed to the sparse host paint by the auto mode)."""
import json

import pytest

from conftest import reference_available
from cama_tpu.io.fixture import make_fixture_clip


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    root = tmp_path_factory.mktemp("val_fixture")
    return make_fixture_clip(root, n_frames=4, with_images=True, with_lidar=False)


def test_validate_reports_every_path_and_source(clip, capsys, tmp_path):
    from cama_tpu.validate import DEVICE_PATHS, main

    out_json = str(tmp_path / "VALIDATE.json")
    rc = main(["--clip", clip, "--frames", "2", "--out", out_json])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0, report
    # default widened in round 4: BOTH sources, spread frames, ok roll-up
    assert set(report["sources"]) == {"cama", "nuscenes"}
    assert report["ok"] is True
    for source, rep in report["sources"].items():
        assert set(rep["paths"]) == set(DEVICE_PATHS)
        for name, entry in rep["paths"].items():
            assert entry["vs_host_exact_min_agreement"] > 0.999, (source, name)
    if reference_available():
        assert report["host_exact_byte_identical_to_reference"] is True
        for source, rep in report["sources"].items():
            for name, entry in rep["paths"].items():
                assert entry["vs_reference_min_agreement"] > 0.999, (source, name)
    # --out writes the same artifact
    assert json.load(open(out_json)) == report


def test_spread_frame_ids_covers_head_middle_tail():
    from cama_tpu.validate import spread_frame_ids

    ids = list(range(100, 160))
    picked = spread_frame_ids(ids, 5)
    assert len(picked) == 5
    assert min(picked) == 100 and max(picked) == 159  # head AND tail
    assert any(120 <= p <= 140 for p in picked)  # middle
    assert spread_frame_ids([1, 2], 5) == {1, 2}


def test_validate_single_kernel_forces_compact(clip, capsys, monkeypatch):
    """--kernel compact must execute _overlay_chunk_compact even when the
    auto mode would pick sparse: instrument the kernel and count calls."""
    import cama_tpu.pipeline as pl
    from cama_tpu.validate import main

    calls = {"n": 0}
    real = pl._overlay_chunk_compact

    def spy(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(pl, "_overlay_chunk_compact", spy)
    rc = main(["--clip", clip, "--frames", "2", "--kernel", "compact",
               "--source", "cama"])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0, report
    assert list(report["sources"]["cama"]["paths"]) == ["compact"]
    assert calls["n"] > 0, "compact kernel was bypassed"
