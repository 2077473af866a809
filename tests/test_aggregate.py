"""LiDAR aggregation + CAMAv2 site aggregation tests on fixture clips.

The fixture's LiDAR sweeps sample a known static world-frame point set from
moving poses, so aggregation with the reconstructed chain must collapse all
sweeps back onto that set.  For sites, two clips cover overlapping road with
clip B's SfM frame SE(2)-misaligned; aggregation must recover the alignment
from wigo and dedupe the shared map elements."""
import os

import numpy as np
import pytest

from cama_tpu.aggregate import Site, aggregate_lidar, save_pcd, save_xyz, voxel_downsample
from cama_tpu.aggregate.site import estimate_sim3_to_world
from cama_tpu.io.fixture import make_fixture_clip
from cama_tpu.io.scene import compile_scene


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    return make_fixture_clip(
        tmp_path_factory.mktemp("agg"), n_frames=8, with_images=False, with_lidar=True
    )


def test_lidar_aggregation_collapses_static_world(clip):
    pts = aggregate_lidar(clip, pose_source="cama", every=1)
    assert len(pts) > 10000
    # fixture world content: ground plane z=0 plus a wall at y < -246
    ground = pts[pts[:, 2] < 0.1]
    assert len(ground) > 0.5 * len(pts)
    np.testing.assert_allclose(ground[:, 2].mean(), 0.0, atol=0.02)
    # x/y extents of the generated content
    assert pts[:, 0].min() > -280 and pts[:, 0].max() < -200
    # aggregating via wigo (same poses in the fixture, wider time coverage:
    # scmv only spans the synced camera timestamps, so sweeps past its end
    # are dropped by the cama chain)
    pts_w = aggregate_lidar(clip, pose_source="wigo", every=1)
    assert len(pts_w) >= len(pts)
    ground_w = pts_w[pts_w[:, 2] < 0.1]
    np.testing.assert_allclose(ground_w[:, 2].mean(), 0.0, atol=0.02)


def test_lidar_aggregation_with_voxel_and_intensity(clip):
    dense = aggregate_lidar(clip, pose_source="cama", every=2)
    sparse = aggregate_lidar(clip, pose_source="cama", every=2, voxel=0.5)
    assert 0 < len(sparse) < len(dense)
    with_i = aggregate_lidar(clip, pose_source="cama", every=4, with_intensity=True)
    assert with_i.shape[1] == 4


def test_lidar_host_backend_matches_and_never_touches_jax(clip, monkeypatch):
    """backend='host' is the pure-NumPy f32 mirror: it must (a) never call
    into jax — even `local_devices('cpu')` blocks on jax's global backend
    lock while the tunneled accelerator client initializes (observed live:
    25+ min during a slow service phase) — and (b) match the jitted
    transform to f32 rounding order (~1 ulp), with an identical point count
    (the NaN validity mask is exact either way)."""
    import cama_tpu.aggregate.lidar as lidar_mod

    def boom(*a, **k):
        raise AssertionError("host backend touched a jax API")

    monkeypatch.setattr(lidar_mod.jax, "jit", boom)
    monkeypatch.setattr(lidar_mod.jax, "device_put", boom)
    monkeypatch.setattr(lidar_mod.jax, "local_devices", boom)
    monkeypatch.setattr(lidar_mod, "_transform_points", boom)
    host = aggregate_lidar(clip, pose_source="cama", every=2, backend="host")
    # the fixture clouds are small: 'auto' must pick the host lane too
    auto = aggregate_lidar(clip, pose_source="cama", every=2, backend="auto")
    np.testing.assert_array_equal(auto, host)
    monkeypatch.undo()

    dev = aggregate_lidar(clip, pose_source="cama", every=2, backend="device")
    assert host.shape == dev.shape  # identical validity masking
    np.testing.assert_allclose(host, dev, rtol=2e-6, atol=1e-5)


def test_voxel_downsample_unique():
    pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [1.0, 1.0, 1.0]], np.float32)
    out = voxel_downsample(pts, 0.1)
    assert len(out) == 2


def test_pcd_and_xyz_outputs(clip, tmp_path):
    pts = aggregate_lidar(clip, pose_source="cama", every=4, voxel=1.0)
    pcd = save_pcd(str(tmp_path / "a.pcd"), pts)
    head = open(pcd).read(200)
    assert "PCD v0.7" in head and f"POINTS {len(pts)}" in open(pcd).read()
    colored = save_pcd(str(tmp_path / "b.pcd"), pts, np.full((len(pts), 3), 128))
    assert "rgb" in open(colored).read(200)
    xyz = save_xyz(str(tmp_path / "a.xyz"), pts)
    assert np.loadtxt(xyz).shape == (len(pts), 3)


@pytest.fixture(scope="module")
def site_clips(tmp_path_factory):
    root = tmp_path_factory.mktemp("site")
    a = make_fixture_clip(root, scene_name="scene-a", n_frames=14, with_images=False,
                          with_lidar=True, flat_height=True)
    b = make_fixture_clip(root, scene_name="scene-b", n_frames=14, with_images=False,
                          with_lidar=True, flat_height=True, traj_t_offset=0.7,
                          t0_ms=1600000100000,
                          world_sim3={"yaw_deg": 8.0, "tx": 15.0, "ty": -7.0})
    return a, b


def test_sim3_estimation_recovers_misalignment(site_clips):
    a, b = site_clips
    scene_b = compile_scene(b, sources=("cama",))
    r, t, s = estimate_sim3_to_world(scene_b)
    # the applied misalignment: p_sfm = M @ p_world; estimate inverts it
    yaw = np.deg2rad(8.0)
    M = np.array([[np.cos(yaw), -np.sin(yaw)], [np.sin(yaw), np.cos(yaw)]])
    np.testing.assert_allclose(r[:2, :2], M.T, atol=1e-6)
    np.testing.assert_allclose(s, 1.0, atol=1e-6)
    p_sfm = M @ np.array([10.0, 5.0]) + np.array([15.0, -7.0])
    p_back = s * r[:2, :2] @ p_sfm + t[:2]
    np.testing.assert_allclose(p_back, [10.0, 5.0], atol=1e-6)

    scene_a = compile_scene(a, sources=("cama",))
    ra, ta, sa = estimate_sim3_to_world(scene_a)
    np.testing.assert_allclose(ra, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(ta, 0, atol=1e-9)


def test_site_merge_and_dedupe(site_clips, tmp_path):
    a, b = site_clips
    site = Site.from_clips([a, b], dedupe_tol=0.5)
    # both clips label the same 8 world polylines -> all of B's dedupe away
    n_a = sum(1 for _, _, ci in site.instances if ci == 0)
    n_b = sum(1 for _, _, ci in site.instances if ci == 1)
    assert n_a == 8
    assert n_b == 0

    fp, _ = site.flat_points_recentered()
    assert fp.num_valid > 0
    out = site.save_labels_json(str(tmp_path / "site.json"))
    import json

    records = json.load(open(out))
    assert len(records) == len(site.instances)
    site.save_pcd(str(tmp_path / "site.pcd"))
    assert os.path.getsize(tmp_path / "site.pcd") > 1000


def test_site_reprojection_into_member_clip(site_clips):
    """The merged site map, pulled back through clip B's inverse Sim(3), must
    reproject (almost) like clip B's own labels."""
    from cama_tpu.pipeline import ClipPipeline

    a, b = site_clips
    site = Site.from_clips([a, b])
    pipe_site = site.pipeline_for_clip(1, chunk=4)  # clip B
    assert "site" in pipe_site.scene.flat
    own = dict(ClipPipeline(clip_path=b, chunk=4).iter_overlay_rasters("cama"))
    via_site = dict(pipe_site.iter_overlay_rasters("site"))
    assert set(own) == set(via_site)
    agree = total = 0
    for idx in own:
        agree += (own[idx] == via_site[idx]).sum()
        total += own[idx].size
    # Sim(3) round-trip + dedupe keep the overlays nearly identical
    assert agree / total > 0.999, agree / total


def test_site_lidar_aggregation(site_clips):
    a, b = site_clips
    site = Site.from_clips([a, b])
    cloud = site.aggregate_lidar(voxel=0.5, every=4)
    assert len(cloud) > 1000
    # both clips observe the same static world; the merged cloud must stay
    # within the world content bounds (i.e. B's misalignment was removed)
    assert cloud[:, 0].min() > -285 and cloud[:, 0].max() < -195
    ground = cloud[np.abs(cloud[:, 2]) < 0.1]
    assert len(ground) > 0.3 * len(cloud)


def test_device_dedupe_matches_host_greedy():
    """The batched device chamfer dedupe must keep exactly the set the
    round-1 O(n^2) host loop kept — randomized 120-instance site."""
    from cama_tpu.aggregate.site import chamfer_distance

    rng = np.random.default_rng(42)
    site = Site(name="t")
    classes = ["lane_marking", "Crosswalk_Line", "stop_line"]
    instances = []
    base_curves = [
        (rng.uniform(-40, 40, 2), rng.uniform(0.5, 3.0)) for _ in range(30)
    ]
    for k in range(120):
        c = classes[k % 3]
        ci = k % 4  # 4 pseudo-clips
        center, radius = base_curves[rng.integers(0, len(base_curves))]
        n = int(rng.integers(4, 400))
        t = np.linspace(0, 1, n)
        pts = np.stack(
            [center[0] + radius * t * 10,
             center[1] + np.sin(t * 6) * radius,
             0.1 * t], axis=1
        ).astype(np.float32)
        pts += rng.normal(0, rng.choice([0.01, 0.2, 1.5]), pts.shape).astype(np.float32)
        instances.append((c, pts, ci))
    site.instances = list(instances)
    removed_dev = site.dedupe(tol=0.5)
    kept_dev = [(c, ci, len(p)) for c, p, ci in site.instances]

    # legacy host greedy loop
    kept = []
    for cls_name, pts, ci in instances:
        dup = False
        for k_cls, k_pts, k_ci in kept:
            if k_cls != cls_name or k_ci == ci:
                continue
            lo = np.maximum(pts.min(0), k_pts.min(0))
            hi = np.minimum(pts.max(0), k_pts.max(0))
            if np.any(lo - hi > 0.5):
                continue
            if chamfer_distance(pts, k_pts) < 0.5:
                dup = True
                break
        if not dup:
            kept.append((cls_name, pts, ci))
    kept_host = [(c, ci, len(p)) for c, p, ci in kept]
    assert kept_dev == kept_host
    assert removed_dev == 120 - len(kept_host)
    assert removed_dev > 10  # the fixture must actually exercise duplicates


def test_refine_alignment_recovers_perturbation(site_clips):
    """Perturb clip 1's estimated Sim(3) by a known small transform; joint
    refinement (device Adam on cross-clip chamfer) must pull the pair
    chamfer back down near the unperturbed level."""
    from cama_tpu.aggregate.site import apply_sim3_points

    a, b = site_clips
    site = Site(name="ref")
    for path in (a, b):
        scene = compile_scene(path, sources=("cama",))
        site.add_clip(path, scene)

    # apply a known perturbation to clip 1's world points + stored Sim(3)
    ang = np.deg2rad(1.5)
    Rp = np.array([[np.cos(ang), -np.sin(ang), 0],
                   [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    tp = np.array([0.8, -0.5, 0.1])
    path1, scene1, (r1, t1, s1) = site.clips[1]
    site.clips[1] = (path1, scene1, (Rp @ r1, Rp @ t1 + tp, s1))
    site.instances = [
        (c, (p @ Rp.T + tp).astype(np.float32) if ci == 1 else p, ci)
        for c, p, ci in site.instances
    ]

    before, after = site.refine_alignment(iters=600, lr=2e-2, tol=4.0)
    assert before > 2.0  # the perturbation is visible in the pair chamfer
    # the clean (unperturbed) site's candidate pairs sit at ~1.02 mean
    # chamfer (non-duplicate same-class pairs within tol dominate); the
    # refinement must recover most of the way back to that floor
    assert after < before * 0.45

    # the folded Sim(3)s must be consistent with the refined instance points
    for cls_name, pts, ci in site.instances[:3]:
        _, scene, (r, t, s) = site.clips[ci]
        # round-trip world -> sfm -> world through the stored Sim(3)
        local = ((np.asarray(pts, np.float64) - t) @ np.asarray(r)) / s
        back = apply_sim3_points(local, r, t, s)
        np.testing.assert_allclose(back, pts, atol=1e-3)

    removed = site.dedupe(tol=0.5)
    assert removed > 0  # refined overlaps now dedupe like the clean site


def test_refine_alignment_host_backend_matches_device(site_clips, monkeypatch):
    """backend='host' pins the SAME refinement programs to the in-process
    CPU device so a fresh `refine: true` process never waits on the remote
    compile service (ROADMAP 'site refinement cold start').  The math is the
    identical jitted code, so results must equal the default-backend path
    exactly; every tensor placement in host mode must be the CPU device.
    'auto' (the production default) routes small sites to host."""
    import jax

    def perturbed_site():
        a, b = site_clips
        site = Site(name="ref")
        for path in (a, b):
            site.add_clip(path, compile_scene(path, sources=("cama",)))
        ang = np.deg2rad(1.5)
        Rp = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        tp = np.array([0.8, -0.5, 0.1])
        path1, scene1, (r1, t1, s1) = site.clips[1]
        site.clips[1] = (path1, scene1, (Rp @ r1, Rp @ t1 + tp, s1))
        site.instances = [
            (c, (p @ Rp.T + tp).astype(np.float32) if ci == 1 else p, ci)
            for c, p, ci in site.instances
        ]
        return site

    placements = []
    orig_put = jax.device_put

    def spy_put(x, device=None, **kw):
        # record the INPUT kind too: a jax.Array arriving here means the
        # tensor was materialized on the DEFAULT device first (the round-4
        # jnp.asarray-before-device_put bug — on a tunneled TPU that upload
        # hard-blocks behind any in-flight background warm compile)
        placements.append((device, isinstance(x, jax.Array)))
        return orig_put(x, device, **kw)

    monkeypatch.setattr(jax, "device_put", spy_put)
    s_host = perturbed_site()
    r_host = s_host.refine_alignment(iters=150, tol=4.0, backend="host")
    assert placements and all(
        d is not None and d.platform == "cpu" for d, _ in placements)
    assert not any(was_jax for _, was_jax in placements), \
        "host backend routed a tensor through the default device"
    monkeypatch.setattr(jax, "device_put", orig_put)

    s_dev = perturbed_site()
    r_dev = s_dev.refine_alignment(iters=150, tol=4.0, backend="device")

    assert r_host == r_dev  # identical programs, identical floats
    for (c_h, p_h, i_h), (c_d, p_d, i_d) in zip(s_host.instances,
                                                s_dev.instances):
        assert (c_h, i_h) == (c_d, i_d)
        np.testing.assert_array_equal(p_h, p_d)
    for (_, _, (r_h, t_h, sc_h)), (_, _, (r_d, t_d, sc_d)) in zip(
            s_host.clips, s_dev.clips):
        np.testing.assert_array_equal(r_h, r_d)
        np.testing.assert_array_equal(t_h, t_d)
        assert sc_h == sc_d


def test_refine_subprocess_fallback_matches_inprocess(site_clips,
                                                      monkeypatch):
    """When the in-process CPU device probe times out (jax's backend lock
    held by a hung tunneled-client init), refine must fall back to the
    CPU-pinned subprocess and produce the identical result — same core,
    same floats (the child pins the platform pre-init, so its CPU programs
    match the parent's CPU programs exactly)."""
    import warnings

    import cama_tpu.aggregate.site as site_mod

    def build():
        site = Site(name="sub")
        for path in site_clips:
            site.add_clip(path, compile_scene(path, sources=("cama",)))
        ang = np.deg2rad(1.5)
        Rp = np.array([[np.cos(ang), -np.sin(ang), 0],
                       [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
        tp = np.array([0.8, -0.5, 0.1])
        path1, scene1, (r1, t1, s1) = site.clips[1]
        site.clips[1] = (path1, scene1, (Rp @ r1, Rp @ t1 + tp, s1))
        site.instances = [
            (c, (p @ Rp.T + tp).astype(np.float32) if ci == 1 else p, ci)
            for c, p, ci in site.instances
        ]
        return site

    monkeypatch.setattr(site_mod, "_local_cpu_device", lambda *a, **k: None)
    s_sub = build()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        r_sub = s_sub.refine_alignment(iters=120, tol=4.0, backend="host")
    assert any("CPU-pinned subprocess" in str(x.message) for x in w)
    monkeypatch.undo()

    s_in = build()
    r_in = s_in.refine_alignment(iters=120, tol=4.0, backend="host")
    assert r_sub == r_in
    for (c_a, p_a, i_a), (c_b, p_b, i_b) in zip(s_sub.instances,
                                                s_in.instances):
        assert (c_a, i_a) == (c_b, i_b)
        np.testing.assert_array_equal(p_a, p_b)


def test_site_member_overlays_batched_matches_per_clip(site_clips):
    """Batched site-map reprojection into all member clips must equal each
    member's own pipeline reprojection of the 'site' source."""
    site = Site.from_clips(site_clips)
    got = {}
    for ci, idx, raster in site.member_overlay_rasters(chunk=4):
        got[(ci, idx)] = raster
    assert len(got) > 0
    for ci in range(len(site.clips)):
        pipe = site.pipeline_for_clip(ci, chunk=4)
        singles = dict(pipe.iter_overlay_rasters("site"))
        assert {i for c, i in got if c == ci} == set(singles)
        for idx, r in singles.items():
            np.testing.assert_array_equal(got[(ci, idx)], r,
                                          err_msg=f"clip {ci} frame {idx}")


def test_dedupe_survives_utm_scale_coordinates():
    """Real wigo frames are global UTM (~1e6 m): f32 storage would quantize
    points by ~0.5 m — the dedupe tolerance itself. The f64 store + recenter-
    before-device-cast path must keep sub-tolerance geometry intact."""
    rng = np.random.default_rng(3)
    offset = np.array([3.6e5, 4.69e6, 12.0])  # Boston-ish UTM easting/northing
    site = Site(name="utm")
    t = np.linspace(0, 1, 120)
    base = np.stack([t * 30, np.sin(t * 5) * 2, 0 * t], 1)
    # clip 0: original; clip 1: same elements shifted 5 cm (true duplicates)
    # plus one genuinely distinct element 1.2 m away (must be kept)
    site.instances = [
        ("lane_marking", (base + offset), 0),
        ("lane_marking", (base + offset + [0.05, 0.0, 0.0]), 1),
        ("lane_marking", (base + offset + [0.0, 1.2, 0.0]), 1),
    ]
    removed = site.dedupe(tol=0.5)
    assert removed == 1  # the 5 cm twin dropped, the 1.2 m element kept
    kept_offsets = sorted(
        float(np.linalg.norm((p - offset - base)[0])) for _, p, _ in site.instances
    )
    assert kept_offsets[0] < 1e-9 and abs(kept_offsets[1] - 1.2) < 1e-6


def test_voxel_downsample_utm_scale():
    from cama_tpu.aggregate import voxel_downsample

    offset = np.array([3.6e5, 4.69e6, 12.0])
    pts = offset + np.array([[0.0, 0, 0], [0.05, 0, 0], [0.31, 0, 0]])
    out = voxel_downsample(pts, 0.2)
    assert len(out) == 2  # first two share a voxel; third is its own


def test_host_chamfer_matches_device():
    """The NumPy chamfer fallback (small-site dedupe without a device
    compile) must match the jitted _chamfer_pairs."""
    import numpy as np

    from cama_tpu.aggregate.site import _chamfer_pairs, _chamfer_pairs_host

    rng = np.random.default_rng(7)
    I, S = 6, 32
    pts = rng.normal(size=(I, S, 3)).astype(np.float32)
    w = np.zeros((I, S), np.float32)
    for k in range(I):
        n = rng.integers(5, S)
        w[k, :n] = 1.0 / n
        pts[k, n:] = 0
    ii = np.asarray([0, 1, 2, 3], np.int32)
    jj = np.asarray([1, 2, 3, 4], np.int32)
    host = _chamfer_pairs_host(pts, w, ii, jj)
    dev = np.asarray(_chamfer_pairs(pts, w, ii, jj))
    np.testing.assert_allclose(host, dev, rtol=1e-5, atol=1e-5)


def test_collinear_trajectory_warns(tmp_path):
    """A (near-)straight trajectory leaves the Umeyama roll DOF free — the
    alignment must say so (the short default fixture drives an almost
    straight line: singular-value ratio ~4e-4), while the longer curved
    site fixtures must stay warning-free."""
    import warnings

    clip = make_fixture_clip(tmp_path, scene_name="straight", n_frames=6,
                             with_images=False, with_lidar=False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        estimate_sim3_to_world(compile_scene(clip, sources=("cama",)))
    assert any("collinear" in str(w.message) for w in rec)


def test_site_autosettles_collinear_member(tmp_path):
    """A near-collinear member (free Umeyama roll DOF) that shares map
    elements with another member must be settled automatically by
    from_clips' refine pass: no 'arbitrary roll' warning, degenerate set
    emptied, and its merged elements land on the overlapping member's
    (i.e. dedupe still collapses the shared world polylines)."""
    import warnings

    a = make_fixture_clip(tmp_path, scene_name="curved", n_frames=14,
                          with_images=False, with_lidar=False,
                          flat_height=True)
    b = make_fixture_clip(tmp_path, scene_name="straight", n_frames=6,
                          with_images=False, with_lidar=False,
                          flat_height=True, t0_ms=1600000100000,
                          traj_t_offset=0.7)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        site = Site.from_clips([a, b], configs={"scene_cache": False})
    assert not site.degenerate_clips
    assert not any("arbitrary roll" in str(w.message) for w in rec)


def test_site_warns_when_collinear_member_unsettleable(tmp_path):
    """A degenerate member with NO other member to settle against keeps the
    free roll DOF — the warning must survive exactly then."""
    import warnings

    a = make_fixture_clip(tmp_path, scene_name="straight-solo", n_frames=6,
                          with_images=False, with_lidar=False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        site = Site.from_clips([a], configs={"scene_cache": False})
    assert site.degenerate_clips == {0}
    assert any("arbitrary roll" in str(w.message) for w in rec)
