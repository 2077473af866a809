"""CAMAv2 site-level multi-scene aggregation (reference README 2.0.0 release
note: "aggregates scenes with intersecting portions into one large scene
called a site" — code absent from the snapshot, SURVEY.md §2.3; designed here
from the CAMAv2 paper's premise + the repo's primitives).

Each clip's CAMA map lives in that clip's SfM (scmv) frame.  nuScenes ego
odometry (odometry/wigo.txt) is globally registered per location (UTM), so a
per-clip Sim(3) from SfM frame to the shared world frame is recoverable by
Umeyama alignment of the reconstructed chassis trajectory against the wigo
trajectory at matched timestamps.  A Site then:

  * estimates T_world<-sfm (+ scale) per clip,
  * transforms every clip's lifted 3-D map instances into the world frame,
  * merges instance lists and dedupes overlapping elements by symmetric
    chamfer distance (intersecting portions appear in several clips),
  * exposes the merged map as flat tensors for device-side reprojection /
    metrics against any member clip, and can aggregate LiDAR across clips.

Head/tail frames a single clip drops are covered by neighbors — the CAMAv2
motivation (README.md:23-24).
"""
from __future__ import annotations

import json
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from cama_tpu.aggregate.lidar import aggregate_lidar, save_pcd
from cama_tpu.eval.pose_metrics import umeyama_alignment
from cama_tpu.io.scene import DEFAULT_CAMA_CONFIGS, compile_scene
from cama_tpu.ops import lift
from cama_tpu.se3.trajectory import apply_seek, seek_indices


def estimate_sim3_to_world(scene, t_max_diff=0.5, info=None):
    """Per-clip Sim(3): SfM(scmv-derived chassis) frame -> wigo world frame.

    Matches the clip's reconstructed chassis2world trajectory (scene.traj
    ['cama'], built in io.scene) against wigo poses interpolated at the same
    timestamps, then Umeyama with scale.

    Returns (R [3,3], t [3], s) with p_world = s * R @ p_sfm + t.

    `info`: optional dict the caller owns — filled with ``sv_ratio`` and
    ``degenerate`` (near-collinear trajectory, free Umeyama roll DOF).  When
    passed, the degeneracy warning is suppressed: the caller takes over
    handling (Site.from_clips auto-settles the roll via refine_alignment
    against overlapping members instead of advising it in a warning).
    """
    sfm = scene.traj["cama"]
    ts = sfm.timestamps[:, 0]
    sfm_xyz = sfm.as_transform(True)[:, :3, 3]

    # the clip reader is the single wigo resolution point (io/clip.py)
    from cama_tpu.io.clip import ClipReader
    from cama_tpu.se3.codec import tum_to_transforms

    reader = scene.reader if getattr(scene, "reader", None) is not None \
        else ClipReader(scene.clip_path)
    wigo = reader.odometry("wigo.txt")

    T_w, t_w = tum_to_transforms(wigo)
    idx = seek_indices(t_w, ts, t_max_diff, interpolate=True)
    matched = apply_seek(T_w, idx)
    ok = idx["valid"]
    if ok.sum() < 3:
        raise RuntimeError("not enough matched poses for site alignment")
    # (near-)collinear trajectories (a straight-road clip) make the Umeyama
    # covariance rank-deficient: the rotation about the driving axis is a
    # free DOF and the SVD picks one arbitrarily — warn, because the clip's
    # map then rolls out of the road plane with no other symptom
    pos = sfm_xyz[ok]
    sv = np.linalg.svd(pos - pos.mean(0), compute_uv=False)
    ratio = float(sv[1] / sv[0]) if sv[0] > 0 else 0.0
    degenerate = sv[0] > 0 and ratio < 1e-3
    if info is not None:
        info["sv_ratio"] = ratio
        info["degenerate"] = bool(degenerate)
    elif degenerate:
        import warnings

        warnings.warn(
            f"site alignment for {scene.clip_path}: trajectory is near-"
            f"collinear (singular-value ratio {ratio:.1e}) — the "
            "Umeyama rotation has a free roll DOF; consider refine_alignment "
            "to settle it against overlapping clips", stacklevel=2)
    r, t, s = umeyama_alignment(sfm_xyz[ok].T, matched[ok][:, :3, 3].T, with_scale=True)
    return r, t, s


def apply_sim3_points(points, r, t, s):
    """float64 output: the wigo world frame is global UTM, where casting to
    f32 quantizes coordinates by up to ~0.5 m — the same order as the dedupe
    tolerance.  Device kernels recenter before any f32 cast."""
    return s * (np.asarray(points, dtype=np.float64) @ np.asarray(r).T) + t


def chamfer_distance(a, b, subsample=256):
    """Symmetric mean nearest-neighbor distance between two point sets.

    Each set subsamples with its own fresh rng(0), so a set's subsample
    depends only on its own length — exactly what the batched device path
    draws once per instance (dedupe/_candidate_pairs)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if len(a) > subsample:
        a = a[np.random.default_rng(0).choice(len(a), subsample, replace=False)]
    if len(b) > subsample:
        b = b[np.random.default_rng(0).choice(len(b), subsample, replace=False)]
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return 0.5 * (d.min(axis=1).mean() + d.min(axis=0).mean())


PAIR_BLOCK = 128  # chamfer pairs per device dispatch ([B, S, S] stays ~33 MB)


@jax.jit
def _chamfer_pairs(pts, w, ii, jj):
    """Batched symmetric chamfer over index pairs.

    pts: [I, S, 3] per-instance subsampled points (padded)
    w:   [I, S] weights (1/n_i on real points, 0 on pads — so the masked
         weighted sum IS the mean over real points)
    ii, jj: [B] int32 pair indices
    Returns [B] float32 chamfer distances.
    """
    a, b = pts[ii], pts[jj]          # [B, S, 3]
    wa, wb = w[ii], w[jj]            # [B, S]
    d2 = jnp.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)
    inf = jnp.float32(1e30)
    d_ab = jnp.sqrt(jnp.min(jnp.where(wb[:, None, :] > 0, d2, inf), axis=2))
    d_ba = jnp.sqrt(jnp.min(jnp.where(wa[:, :, None] > 0, d2, inf), axis=1))
    return 0.5 * (jnp.sum(d_ab * wa, axis=1) + jnp.sum(d_ba * wb, axis=1))


# below this many candidate pairs the NumPy chamfer runs the whole dedupe in
# well under a second — using it avoids the minutes-scale remote compile of
# _chamfer_pairs in fresh processes (the same rationale as the pipeline's
# adaptive host lane); larger sites amortize the one-time device compile
HOST_CHAMFER_MAX_PAIRS = 4096


def _chamfer_pairs_host(pts, w, ii, jj):
    """NumPy float32 mirror of _chamfer_pairs (same formula, same masking);
    blocked so the [B, S, S] distance tensor stays ~33 MB."""
    out = np.empty(len(ii), np.float32)
    for s in range(0, len(ii), PAIR_BLOCK):
        bi, bj = ii[s:s + PAIR_BLOCK], jj[s:s + PAIR_BLOCK]
        a, b = pts[bi], pts[bj]
        wa, wb = w[bi], w[bj]
        d2 = np.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2,
                    axis=-1, dtype=np.float32)
        inf = np.float32(1e30)
        d_ab = np.sqrt(np.min(np.where(wb[:, None, :] > 0, d2, inf), axis=2))
        d_ba = np.sqrt(np.min(np.where(wa[:, :, None] > 0, d2, inf), axis=1))
        out[s:s + PAIR_BLOCK] = 0.5 * (np.sum(d_ab * wa, axis=1)
                                       + np.sum(d_ba * wb, axis=1))
    return out


def _rotvec_to_matrix_np(v):
    """NumPy f64 mirror of the traced unnormalized Rodrigues used by
    refine_alignment — the Sim(3) fold-in step runs entirely on host so a
    host-backend refinement never touches the accelerator."""
    v = np.asarray(v, np.float64)
    K = np.array([[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]])
    theta2 = float(v @ v) + 1e-16
    theta = np.sqrt(theta2)
    return (np.eye(3) + (np.sin(theta) / theta) * K
            + ((1.0 - np.cos(theta)) / theta2) * (K @ K))


def _candidate_pairs(instances, subsample, tol):
    """Shared prefilter for dedupe and refinement: subsample every instance
    once (fresh rng(0) per instance — same draw chamfer_distance makes) into
    padded [I, S, 3] points + [I, S] mean-weights, and select cross-clip
    same-class pairs whose bboxes come within `tol`.

    Points are RECENTERED by the site mean before the f32 cast: world
    coordinates are UTM-scale, where raw f32 would quantize by ~0.5 m.
    Chamfer distances are translation-invariant, so values are unchanged.

    Returns (pts, w, ii, jj, clip, center) with ii earlier / jj later
    instance indices (empty when nothing is in range); `center` [3] f64 is
    the subtracted offset.
    """
    I = len(instances)
    S = subsample
    center = np.mean(
        [np.asarray(p, np.float64).mean(0) for _, p, _ in instances], axis=0
    )
    pts = np.zeros((I, S, 3), np.float32)
    w = np.zeros((I, S), np.float32)
    for k, (_, p, _) in enumerate(instances):
        if len(p) > S:
            p = p[np.random.default_rng(0).choice(len(p), S, replace=False)]
        pts[k, : len(p)] = np.asarray(p, np.float64) - center
        w[k, : len(p)] = 1.0 / len(p)
    # dense class ids via np.unique (a hash could collide between two names)
    _, cls_id = np.unique([c for c, _, _ in instances], return_inverse=True)
    clip = np.asarray([ci for _, _, ci in instances], np.int32)
    los = np.stack([np.asarray(p, np.float64).min(0) for _, p, _ in instances])
    his = np.stack([np.asarray(p, np.float64).max(0) for _, p, _ in instances])
    jj, ii = np.nonzero(
        np.tril(np.ones((I, I), bool), -1)
        & (cls_id[:, None] == cls_id[None, :])
        & (clip[:, None] != clip[None, :])
        & np.all(
            np.maximum(los[:, None], los[None, :])
            - np.minimum(his[:, None], his[None, :]) <= tol,
            axis=-1,
        )
    )
    return pts, w, ii, jj, clip, center


class Site:
    """A merged multi-clip site map in the shared wigo-world frame."""

    def __init__(self, name="site", configs=None):
        self.name = name
        self.configs = {**DEFAULT_CAMA_CONFIGS, **(configs or {})}
        self.clips = []  # (clip_path, scene, (r, t, s))
        self.instances = []  # (class_name, points [P, 3] world, clip_index)
        # clip indices whose Umeyama alignment had a free roll DOF (near-
        # collinear trajectory) and have NOT been settled by refinement yet
        self.degenerate_clips = set()

    @classmethod
    def from_clips(cls, clip_paths, configs=None, dedupe_tol=0.5, name="site",
                   refine=False, scenes=None):
        """Build a site from member clips.  Pass `scenes` (parallel to
        clip_paths) to reuse already-compiled Scenes — the CLI hands over the
        pipelines it just built instead of re-lifting every member."""
        site = cls(name=name, configs=configs)
        configs = site.configs
        if scenes is not None and len(scenes) != len(clip_paths):
            raise ValueError(
                f"scenes ({len(scenes)}) must parallel clip_paths "
                f"({len(clip_paths)})")
        for i, path in enumerate(clip_paths):
            scene = scenes[i] if scenes is not None else None
            if scene is not None and "cama" not in scene.flat:
                raise ValueError(
                    f"prebuilt scene for {path} lacks the 'cama' source")
            if scene is None:
                cache = None
                if configs.get("scene_cache", True):
                    # distinct filename from the pipeline's (cama, nuscenes)
                    # cache: the key embeds the source tuple, and alternating
                    # keys on one file would recompile every time
                    cache = os.path.join(str(path), ".cama_tpu",
                                         "scene_cache_cama.npz")
                scene = compile_scene(path, configs, sources=("cama",),
                                      cache=cache)
            site.add_clip(path, scene)
        # a degenerate (near-collinear) member's Umeyama roll is a free DOF:
        # settle it automatically against overlapping members instead of
        # shipping an arbitrary roll behind a warning the user must act on
        if refine or site.degenerate_clips:
            site.refine_alignment()
        site.warn_unsettled()
        site.dedupe(tol=dedupe_tol)
        return site

    def add_clip(self, clip_path, scene):
        info = {}
        r, t, s = estimate_sim3_to_world(scene, info=info)
        ci = len(self.clips)
        if info.get("degenerate"):
            self.degenerate_clips.add(ci)
        self.clips.append((str(clip_path), scene, (r, t, s)))
        fp = scene.flat["cama"]
        for inst in lift.unflatten_to_instances(fp):
            world_pts = apply_sim3_points(inst["points"], r, t, s)
            self.instances.append((inst["class"], world_pts, ci))

    def warn_unsettled(self):
        """Warn for member clips whose free-roll (near-collinear) alignment
        could NOT be settled — i.e. after refinement they still had no
        cross-clip correspondences to optimize against.  from_clips calls
        this after the auto-refine pass, so the warning fires only when
        settling was genuinely impossible."""
        if not self.degenerate_clips:
            return
        import warnings

        for ci in sorted(self.degenerate_clips):
            warnings.warn(
                f"site {self.name!r}: member {self.clips[ci][0]} has a near-"
                "collinear trajectory (free Umeyama roll DOF) and no "
                "overlapping map elements in other members to settle it "
                "against — its merged elements may carry an arbitrary roll",
                stacklevel=2)

    def dedupe(self, tol=0.5, subsample=256):
        """Drop map elements that duplicate an earlier clip's element of the
        same class within `tol` m symmetric chamfer distance (the intersecting
        portions shared by overlapping scenes).

        Device-resident: every instance is subsampled once into a padded
        [I, S, 3] tensor, bbox/class/clip prefiltering picks candidate pairs
        on host (vectorized), and all candidate chamfers run as batched
        [B, S, S] reductions on device.  Only the trivial greedy keep scan
        (earlier-instance-wins, matching the reference-order semantics) stays
        in Python — over precomputed booleans, not point sets."""
        I = len(self.instances)
        if I < 2:
            return 0
        pts, w, ii, jj, _, _ = _candidate_pairs(self.instances, subsample, tol)
        close = np.zeros((I, I), bool)
        if 0 < len(ii) <= HOST_CHAMFER_MAX_PAIRS:
            # small sites: the NumPy chamfer finishes in well under a second
            # — never pay a fresh-process device compile for it
            close[jj, ii] = _chamfer_pairs_host(pts, w, ii, jj) < tol
        elif len(ii):
            pts_d, w_d = jnp.asarray(pts), jnp.asarray(w)
            # dispatch ALL blocks first (JAX dispatch is async), fetch after:
            # fetching inside the loop would serialize one full ~30 ms
            # dispatch+link round-trip per 128-pair block on the tunneled
            # chip; outputs are tiny [PAIR_BLOCK] vectors, so holding every
            # block's result on device is free
            launched = []
            for s in range(0, len(ii), PAIR_BLOCK):
                bi = ii[s : s + PAIR_BLOCK]
                bj = jj[s : s + PAIR_BLOCK]
                pad = PAIR_BLOCK - len(bi)
                if pad:
                    bi = np.pad(bi, (0, pad))
                    bj = np.pad(bj, (0, pad))
                launched.append((pad, _chamfer_pairs(
                    pts_d, w_d, jnp.asarray(bi.astype(np.int32)),
                    jnp.asarray(bj.astype(np.int32)))))
            dvals = np.concatenate(
                [np.asarray(d)[: PAIR_BLOCK - pad] for pad, d in launched])
            close[jj, ii] = dvals < tol

        keep_mask = np.ones(I, bool)
        for j in range(I):
            if close[j, : j][keep_mask[: j]].any():
                keep_mask[j] = False
        removed = int((~keep_mask).sum())
        self.instances = [inst for inst, k in zip(self.instances, keep_mask) if k]
        return removed

    # ---------------- joint alignment refinement ----------------

    def refine_alignment(self, iters=600, lr=2e-2, tol=2.0, subsample=128,
                         backend="auto"):
        """Joint Sim(3) bundle refinement across clips (ROADMAP: 'jointly
        re-optimize per-clip Sim(3) against map-element correspondences').

        The per-clip wigo-Umeyama estimates are independent; here a residual
        delta-Sim(3) per clip (clip 0 anchored) is optimized by Adam on the
        symmetric chamfer distance between candidate duplicate instance pairs
        — the same [B, S, S] batched device reduction the dedupe uses, but
        differentiable end-to-end under jax.grad.  Parameters are (so(3)
        rotation vector, translation, log-scale); deltas compose onto the
        stored Sim(3)s and instance points afterwards.

        `backend`: 'device' jits for the default accelerator; 'host' pins
        every tensor to the in-process CPU device so the SAME programs (same
        autodiff, same Adam) compile LOCALLY in seconds — a fresh process
        never pays the remote compile service's minutes-scale RTT for a
        `refine: true` site (the dedupe/pipeline host lanes' rationale).
        'auto' (default) picks 'host' for small sites
        (pairs <= HOST_CHAMFER_MAX_PAIRS) where the one-core chamfer is
        sub-second per step anyway, and 'device' for large ones that
        amortize the compile.

        Returns (chamfer_before, chamfer_after) mean pair distances; no-op
        (returns (0, 0)) when no cross-clip pairs exist within `tol`.
        """
        import optax

        I = len(self.instances)
        n_clips = len(self.clips)
        if I < 2 or n_clips < 2:
            return 0.0, 0.0
        pts, w, ii, jj, clip, world_center = _candidate_pairs(self.instances, subsample, tol)
        if len(ii) == 0:
            return 0.0, 0.0
        # clips with cross-clip correspondences get their free-roll DOF
        # settled by the chamfer objective (or confirmed already-settled
        # when refinement declines) — drop them from the unsettled set
        self.degenerate_clips -= ({int(c) for c in clip[ii]}
                                  | {int(c) for c in clip[jj]})

        # pad pairs to a block multiple: the differentiable chamfer runs as a
        # lax.map over PAIR_BLOCK-sized blocks, bounding device memory at the
        # same ~33 MB per block the dedupe uses (an unchunked [B, S, S] with
        # thousands of pairs would OOM under value_and_grad)
        n_pairs = len(ii)
        pad = (-n_pairs) % PAIR_BLOCK
        ii_p = np.pad(ii, (0, pad))
        jj_p = np.pad(jj, (0, pad))
        pair_mask = np.pad(np.ones(n_pairs, np.float32), (0, pad))

        if backend not in ("auto", "host", "device"):
            raise ValueError(f"refine_alignment backend {backend!r} "
                             "(expected auto|host|device)")
        if backend == "auto":
            backend = "host" if n_pairs <= HOST_CHAMFER_MAX_PAIRS else "device"
        cpu_dev = None
        if backend == "host":
            # BOUNDED probe: jax.local_devices itself blocks on jax's global
            # backend lock while the process's first accelerator touch (the
            # tunneled client creation, possibly kicked by a background
            # kernel warm) is still in flight — observed 25+ minutes in a
            # slow service phase.  On timeout, fall back to a clean
            # subprocess pinned to the CPU platform (pays a ~15-30 s
            # interpreter+jax start instead of an unbounded wait).
            cpu_dev = _local_cpu_device()
            if cpu_dev is None:
                import warnings

                warnings.warn(
                    "refine_alignment: the in-process CPU device is "
                    "unavailable (jax backend initialization is blocked — "
                    "likely a tunneled accelerator client still "
                    "connecting); refining in a CPU-pinned subprocess")
                deltas, before, after, center_np = _refine_in_subprocess(
                    pts, w, ii_p, jj_p, pair_mask, clip, n_clips, n_pairs,
                    iters, lr)
                return self._apply_refine_deltas(
                    deltas, before, after, center_np, world_center, n_clips)
        deltas, before, after, center_np = _optimize_pair_deltas(
            pts, w, ii_p, jj_p, pair_mask, clip, n_clips, n_pairs, iters,
            lr, cpu_dev=cpu_dev)
        return self._apply_refine_deltas(deltas, before, after, center_np,
                                         world_center, n_clips)

    def _apply_refine_deltas(self, deltas, before, after, center_np,
                             world_center, n_clips):
        """Fold optimized delta-Sim(3)s into the stored transforms and
        world-frame instance points (deltas=None: refinement declined —
        iters==0 or it would have made the site worse)."""
        if deltas is None:
            return before, after
        rot, tns, lgs = deltas
        # the optimization ran in recentered coordinates, so the
        # world-frame pivot is world_center + the local centroid
        cen = np.asarray(world_center, np.float64) + center_np
        applied = []
        for c in range(n_clips):
            Rd = _rotvec_to_matrix_np(rot[c])
            sd = float(np.exp(lgs[c]))
            td = tns[c].astype(np.float64)
            applied.append((Rd, td, sd))
            path, scene, (r0, t0, s0) = self.clips[c]
            # p' = sd Rd (p - cen) + cen + td with p = s0 R0 q + t0
            r_new = Rd @ np.asarray(r0)
            s_new = sd * s0
            t_new = sd * (Rd @ (np.asarray(t0, np.float64) - cen)) + cen + td
            self.clips[c] = (path, scene, (r_new, t_new, s_new))
        self.instances = [
            (cn, applied[ci][2] * ((np.asarray(p, np.float64) - cen)
                                   @ applied[ci][0].T) + cen + applied[ci][1],
             ci)
            for cn, p, ci in self.instances
        ]
        return before, after

    # ---------------- outputs ----------------

    def flat_points(self, class_names=None, pad_multiple=1024):
        """Merged map as FlatPoints (device-ready, same layout the per-clip
        pipeline consumes) in RAW world coordinates — the round-1 contract.

        World coordinates are UTM-scale, where f32 quantizes by ~0.5 m;
        prefer flat_points_recentered for anything feeding device kernels."""
        return lift.flatten_instances(
            [(c, np.asarray(p, np.float64).astype(np.float32))
             for c, p, _ in self.instances],
            class_names=class_names, pad_multiple=pad_multiple,
        )


    def flat_points_recentered(self, class_names=None, pad_multiple=1024):
        """(FlatPoints, center [3] f64): site centroid subtracted before the
        f32 device layout, so UTM-scale coordinates keep sub-mm resolution."""
        pts = [(c, np.asarray(p, np.float64)) for c, p, _ in self.instances]
        center = (np.mean([p.mean(0) for _, p in pts], axis=0)
                  if pts else np.zeros(3))
        flat = lift.flatten_instances(
            [(c, (p - center).astype(np.float32)) for c, p in pts],
            class_names=class_names, pad_multiple=pad_multiple,
        )
        return flat, center

    def save_labels_json(self, path):
        """Site map as a reference-schema label JSON (world-frame meters,
        xy only — consumable by the nuScenes lifting path)."""
        records = []
        for cls_name, pts, _ in self.instances:
            records.append({
                "attrs": {"type": cls_name},
                "data": np.asarray(pts)[:, :2].tolist(),
                "id": -1, "luid": "site", "point_attrs": [[] for _ in range(len(pts))],
                "shape_type": "polyline", "struct_type": "parsing", "track_id": -1,
            })
        with open(path, "w") as f:
            json.dump(records, f)
        return path

    def save_pcd(self, path):
        pts = np.concatenate([p for _, p, _ in self.instances]) if self.instances else np.zeros((0, 3))
        colors = (
            np.concatenate([
                np.tile(lift.COLOR_MAPS.get(c, lift.COLOR_MAPS["Crosswalk_Line"]), (len(p), 1))
                for c, p, _ in self.instances
            ])
            if self.instances else None
        )
        return save_pcd(path, pts, colors)

    def pipeline_for_clip(self, clip_index, chunk=8):
        """A ClipPipeline that reprojects the MERGED site map into one member
        clip's cameras: site-frame points go back through the clip's inverse
        Sim(3) into its SfM frame and ride its own pose chain — the CAMAv2
        benefit that head/tail frames a single clip drops are covered by the
        site (README.md:23-24).  The injected source is named 'site'."""
        from cama_tpu.pipeline import ClipPipeline

        path, scene, (r, t, s) = self.clips[clip_index]
        # invert p_world = s R p + t  ->  p_sfm = (1/s) R^T (p_world - t)
        rinv = np.asarray(r).T
        instances = []
        for cls_name, pts, _ in self.instances:
            local = ((np.asarray(pts, np.float64) - t) @ rinv.T) / s
            instances.append((cls_name, local.astype(np.float32)))
        flat = lift.flatten_instances(instances,
                                      class_names=scene.flat["cama"].class_names)
        scene.flat["site"] = flat
        scene.traj["site"] = scene.traj["cama"]
        # carry the site's configs: frame_cache/scene_cache knobs must apply
        # to member-video pipelines too
        return ClipPipeline(self.configs, clip_path=path, scene=scene,
                            chunk=chunk)

    def member_overlay_rasters(self, chunk=8, max_in_flight=3):
        """Site-scale serving: reproject the MERGED map into EVERY member
        clip's cameras with one batched device program per chunk
        (pipeline.MultiScenePipeline over the injected 'site' source —
        measured 3.1x over sequential per-clip dispatch on the tunneled chip,
        BENCH.md).  Yields (clip_index, image_idx, cls_raster)."""
        from cama_tpu.pipeline import MultiScenePipeline

        pipes = [self.pipeline_for_clip(i, chunk=chunk)
                 for i in range(len(self.clips))]
        msp = MultiScenePipeline(pipes, source="site", chunk=chunk)
        yield from msp.iter_overlay_rasters(max_in_flight=max_in_flight)

    def member_overlay_videos(self, out_dir, prefix=None, chunk=8, fps=10,
                              preset=None):
        """Write a site-merged overlay video for EVERY member clip — the
        user-facing CAMAv2 site product (release notes,
        /root/reference/README.md:22-24): each member sees the whole site's
        map through its own cameras, so frames its own clip's map misses are
        covered by neighbors.  Device work is scene-batched
        (MultiScenePipeline).  Yields (video_path, frames_written)."""
        from cama_tpu.pipeline import MultiScenePipeline

        prefix = prefix or self.name
        pipes = [self.pipeline_for_clip(i, chunk=chunk)
                 for i in range(len(self.clips))]
        # normpath (trailing slashes give basename '') + uniquify: two
        # same-named clip dirs from different roots must not collapse onto
        # one .mp4 with two encoders writing it
        names, seen = [], {}
        for p in pipes:
            base = os.path.basename(os.path.normpath(str(p.scene.clip_path)))
            n = seen.get(base, 0)
            seen[base] = n + 1
            names.append(base if n == 0 else f"{base}-{n + 1}")
        paths = [
            {"site": os.path.join(out_dir, f"{prefix}_{name}_site.mp4")}
            for name in names
        ]
        if len(pipes) > 1:
            msp = MultiScenePipeline(pipes, source="site", chunk=chunk)
            counts = msp.write_videos(paths, fps=fps, preset=preset)
        else:
            counts = [pipes[0].write_videos(paths[0], fps=fps, preset=preset)]
        for pth, cnt in zip(paths, counts):
            yield pth["site"], cnt["site"]

    def aggregate_lidar(self, voxel=0.2, every=2, **kw):
        """Cross-clip LiDAR aggregation: each clip's sweeps through its own
        reconstructed chain — built with THIS site's configs, the same chain
        the Sim(3) was estimated from (a default-configs chain would live in
        a different SfM frame and misalign the cloud silently) — then Sim(3)
        into the site frame.  with_intensity=True is preserved through the
        transform; voxel dedup drops it (same contract as the module-level
        aggregate_lidar)."""
        kw.setdefault("configs", self.configs)
        clouds = []
        for path, scene, (r, t, s) in self.clips:
            pts = aggregate_lidar(path, pose_source="cama", every=every, **kw)
            if not len(pts):
                continue
            xyz = apply_sim3_points(pts[:, :3], r, t, s)
            clouds.append(np.concatenate([xyz, pts[:, 3:]], axis=1)
                          if pts.shape[1] > 3 else xyz)
        if not clouds:
            return np.zeros((0, 3), np.float32)
        merged = np.concatenate(clouds)
        if voxel:
            from cama_tpu.aggregate.lidar import voxel_downsample

            merged = voxel_downsample(merged[:, :3], voxel)
        return merged



def _local_cpu_device(timeout=60.0):
    """The in-process CPU jax device, or None when jax's backend registry
    cannot answer within `timeout` seconds.  jax.local_devices takes the
    global backend lock; the process's FIRST accelerator touch (tunneled
    client creation, often kicked by a background kernel warm) holds that
    lock for its whole connection handshake — minutes in slow service
    phases.  The probe runs on a daemon thread so the caller can bound the
    wait and fall back; the thread itself finishes harmlessly whenever the
    registry unblocks."""
    import threading

    out = {}

    def probe():
        try:
            out["dev"] = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            out["dev"] = None  # CPU platform compiled out

    th = threading.Thread(target=probe, daemon=True,
                          name="cpu-device-probe")
    th.start()
    th.join(timeout)
    return out.get("dev")


def _refine_in_subprocess(pts, w, ii_p, jj_p, pair_mask, clip, n_clips,
                          n_pairs, iters, lr, timeout=1800):
    """Run _optimize_pair_deltas in a clean child process whose jax platform
    is pinned to CPU BEFORE backend init (jax.config pre-init is the one
    override the baked accelerator sitecustomize honors) — the hang-proof
    fallback when this process's backend registry is blocked."""
    import subprocess
    import sys
    import tempfile

    # the child must import cama_tpu even when the parent got it via a
    # programmatic sys.path insert (examples/, bench.py) rather than an
    # inherited PYTHONPATH
    import cama_tpu

    pkg_parent = os.path.dirname(os.path.dirname(
        os.path.abspath(cama_tpu.__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_parent + os.pathsep + env.get("PYTHONPATH", "")

    with tempfile.TemporaryDirectory() as td:
        in_path = os.path.join(td, "in.npz")
        out_path = os.path.join(td, "out.npz")
        np.savez(in_path, pts=pts, w=w, ii_p=ii_p, jj_p=jj_p,
                 pair_mask=pair_mask, clip=clip, n_clips=n_clips,
                 n_pairs=n_pairs, iters=iters, lr=lr)
        r = subprocess.run(
            [sys.executable, "-m", "cama_tpu.aggregate._refine_child",
             in_path, out_path],
            capture_output=True, text=True, timeout=timeout, env=env)
        if r.returncode != 0:
            raise RuntimeError(
                f"subprocess refinement failed (rc={r.returncode}): "
                f"{r.stderr[-800:]}")
        d = np.load(out_path)
        deltas = ((d["rot"], d["t"], d["log_s"]) if bool(d["has_deltas"])
                  else None)
        return (deltas, float(d["before"]), float(d["after"]), d["center"])


def _optimize_pair_deltas(pts, w, ii_p, jj_p, pair_mask, clip, n_clips,
                          n_pairs, iters, lr, cpu_dev=None):
    """The refinement optimization core (pure jax, shared by the in-process
    backends and the CPU-pinned subprocess child).  Returns
    (deltas | None, chamfer_before, chamfer_after, local_centroid):
    deltas=(rot [n,3], t [n,3], log_s [n]) NumPy, None when refinement is
    declined (iters==0, or it would have made the site worse)."""
    import optax

    # committed-input placement drives jit: with every argument pinned to
    # the CPU device, step/pair_chamfer compile for (and run on) the
    # local CPU backend — no remote compile, no accelerator dispatch
    # device_put on the raw host array: jnp.asarray first would
    # materialize on the DEFAULT device (the tunneled TPU) before the
    # copy to CPU — and a TPU transfer hard-blocks behind any in-flight
    # background warm compile, exactly the stall this backend removes
    put = ((lambda x: jax.device_put(np.asarray(x), cpu_dev))
           if cpu_dev is not None else jnp.asarray)

    # all tensors travel as ARGUMENTS to the jitted functions: a closure
    # capture would embed them as program constants, which forces a
    # device->host fetch at trace time (the tunneled TPU backend rejects
    # that path) and bloats the compiled program
    data = {
        "pts": put(pts),
        "w": put(w),
        "ii": put(ii_p.astype(np.int32).reshape(-1, PAIR_BLOCK)),
        "jj": put(jj_p.astype(np.int32).reshape(-1, PAIR_BLOCK)),
        "mask": put(pair_mask.reshape(-1, PAIR_BLOCK)),
        "clip": put(clip),
        "center": put(pts.reshape(-1, 3)[w.reshape(-1) > 0].mean(0)),
    }
    center_np = np.asarray(data["center"], np.float64)
    # the MXU defaults to bfloat16 passes; sub-meter residuals need f32
    _mm = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def rotvec_to_matrix(v):
        # unnormalized Rodrigues: smooth at v=0 (norm(0) has a NaN grad)
        K = jnp.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])
        theta2 = jnp.sum(v * v) + 1e-16
        theta = jnp.sqrt(theta2)
        return (jnp.eye(3) + (jnp.sin(theta) / theta) * K
                + ((1 - jnp.cos(theta)) / theta2) * _mm(K, K))

    def apply_delta(params, center, p, ci):
        """delta Sim(3) of clip ci applied about the site centroid (so
        rotation/scale gradients do not fight translation)."""
        rv = params["rot"][ci]
        t = params["t"][ci]
        s = jnp.exp(params["log_s"][ci])
        R = rotvec_to_matrix(rv)
        return s * _mm(p - center, R.T) + center + t

    def pair_chamfer(params, d):
        def block(args):
            bi, bj, bm = args
            a = jax.vmap(apply_delta, (None, None, 0, 0))(
                params, d["center"], d["pts"][bi], d["clip"][bi])
            b = jax.vmap(apply_delta, (None, None, 0, 0))(
                params, d["center"], d["pts"][bj], d["clip"][bj])
            wa, wb = d["w"][bi], d["w"][bj]
            d2 = jnp.sum((a[:, :, None, :] - b[:, None, :, :]) ** 2, axis=-1)
            big = 1e30
            d_ab = jnp.sqrt(
                jnp.min(jnp.where(wb[:, None, :] > 0, d2, big), axis=2) + 1e-12)
            d_ba = jnp.sqrt(
                jnp.min(jnp.where(wa[:, :, None] > 0, d2, big), axis=1) + 1e-12)
            per_pair = 0.5 * (jnp.sum(d_ab * wa, 1) + jnp.sum(d_ba * wb, 1))
            return jnp.sum(per_pair * bm)

        sums = jax.lax.map(block, (d["ii"], d["jj"], d["mask"]))
        return sums.sum() / n_pairs

    params = {
        "rot": put(np.zeros((n_clips, 3), np.float32)),
        "t": put(np.zeros((n_clips, 3), np.float32)),
        "log_s": put(np.zeros((n_clips,), np.float32)),
    }
    anchor = put(
        (np.arange(n_clips) != 0).astype(np.float32))  # clip 0 frozen

    opt = optax.adam(lr)
    if cpu_dev is not None:
        # optax.adam's init creates its count scalar eagerly on the
        # DEFAULT device; pin it to CPU so host-mode refinement never
        # dispatches to the accelerator at all
        with jax.default_device(cpu_dev):
            state = opt.init(params)
    else:
        state = opt.init(params)

    @jax.jit
    def step(params, state, d, anchor):
        loss, g = jax.value_and_grad(pair_chamfer)(params, d)
        g = {
            "rot": g["rot"] * anchor[:, None],
            "t": g["t"] * anchor[:, None],
            "log_s": g["log_s"] * anchor,
        }
        updates, state = opt.update(g, state)
        return optax.apply_updates(params, updates), state, loss

    # before/after come from step()'s own loss (chamfer at its INPUT
    # params): a separate jitted forward-only pair_chamfer would be a
    # SECOND remote-compiled program purely for metrics — the final
    # probe call reuses the one compiled step and discards its update
    before = None
    for _ in range(iters):
        params, state, loss = step(params, state, data, anchor)
        if before is None:
            before = float(loss)
    _, _, loss = step(params, state, data, anchor)
    after = float(loss)
    if before is None:  # iters == 0: nothing optimized
        return None, after, after, center_np
    if after >= before:  # refinement must never make the site worse
        return None, before, before, center_np
    return ((np.asarray(params["rot"]), np.asarray(params["t"]),
             np.asarray(params["log_s"])), before, after, center_np)


def main(argv=None):
    """Site aggregation script: merge clips covering intersecting road into
    one site map (CAMAv2 release notes, README.md:22-24)."""
    import argparse

    parser = argparse.ArgumentParser(description="CAMAv2 site-level multi-scene aggregation")
    parser.add_argument("--clips", nargs="+", required=True, help="clip directories")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--name", default="site")
    parser.add_argument("--dedupe-tol", type=float, default=0.5)
    parser.add_argument("--refine", action="store_true",
                        help="jointly refine per-clip Sim(3) (device Adam on "
                             "cross-clip chamfer) before dedupe")
    parser.add_argument("--lidar", action="store_true", help="also aggregate LiDAR")
    parser.add_argument("--lidar-voxel", type=float, default=0.2)
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    site = Site.from_clips(args.clips, dedupe_tol=args.dedupe_tol, name=args.name,
                           refine=args.refine)
    labels = site.save_labels_json(os.path.join(args.out_dir, f"{args.name}_labels.json"))
    pcd = site.save_pcd(os.path.join(args.out_dir, f"{args.name}_map.pcd"))
    print(f"{len(site.clips)} clips -> {len(site.instances)} map elements")
    print(f"labels: {labels}\nmap pcd: {pcd}")
    if args.lidar:
        cloud = site.aggregate_lidar(voxel=args.lidar_voxel)
        out = save_pcd(os.path.join(args.out_dir, f"{args.name}_lidar.pcd"), cloud)
        print(f"lidar: {len(cloud)} points -> {out}")


if __name__ == "__main__":
    main()
