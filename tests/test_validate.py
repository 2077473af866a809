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


def test_validate_reports_every_path(clip, capsys):
    from cama_tpu.validate import DEVICE_PATHS, main

    rc = main(["--clip", clip, "--frames", "2"])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0, report
    assert set(report["paths"]) == set(DEVICE_PATHS)
    for name, entry in report["paths"].items():
        assert entry["vs_host_exact_min_agreement"] > 0.999, name
    if reference_available():
        assert report["host_exact_byte_identical_to_reference"] is True
        for name, entry in report["paths"].items():
            assert entry["vs_reference_min_agreement"] > 0.999, name


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
    rc = main(["--clip", clip, "--frames", "2", "--kernel", "compact"])
    report = json.loads(capsys.readouterr().out)
    assert rc == 0, report
    assert list(report["paths"]) == ["compact"]
    assert calls["n"] > 0, "compact kernel was bypassed"
