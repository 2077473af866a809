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

import numpy as np

from cama_tpu.aggregate.lidar import aggregate_lidar, save_pcd
from cama_tpu.eval.pose_metrics import umeyama_alignment
from cama_tpu.io.scene import DEFAULT_CAMA_CONFIGS, compile_scene
from cama_tpu.ops import lift
from cama_tpu.se3.trajectory import apply_seek, seek_indices


def estimate_sim3_to_world(scene, t_max_diff=0.5):
    """Per-clip Sim(3): SfM(scmv-derived chassis) frame -> wigo world frame.

    Matches the clip's reconstructed chassis2world trajectory (scene.traj
    ['cama'], built in io.scene) against wigo poses interpolated at the same
    timestamps, then Umeyama with scale.

    Returns (R [3,3], t [3], s) with p_world = s * R @ p_sfm + t.
    """
    sfm = scene.traj["cama"]
    ts = sfm.timestamps[:, 0]
    sfm_xyz = sfm.as_transform(True)[:, :3, 3]

    wigo = np.loadtxt(os.path.join(scene.clip_path, "odometry", "wigo.txt"))
    from cama_tpu.se3.codec import tum_to_transforms

    T_w, t_w = tum_to_transforms(wigo)
    idx = seek_indices(t_w, ts, t_max_diff, interpolate=True)
    matched = apply_seek(T_w, idx)
    ok = idx["valid"]
    if ok.sum() < 3:
        raise RuntimeError("not enough matched poses for site alignment")
    r, t, s = umeyama_alignment(sfm_xyz[ok].T, matched[ok][:, :3, 3].T, with_scale=True)
    return r, t, s


def apply_sim3_points(points, r, t, s):
    return (s * (np.asarray(points, dtype=np.float64) @ np.asarray(r).T) + t).astype(np.float32)


def chamfer_distance(a, b, subsample=256):
    """Symmetric mean nearest-neighbor distance between two point sets."""
    rng = np.random.default_rng(0)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    if len(a) > subsample:
        a = a[rng.choice(len(a), subsample, replace=False)]
    if len(b) > subsample:
        b = b[rng.choice(len(b), subsample, replace=False)]
    d = np.linalg.norm(a[:, None, :] - b[None, :, :], axis=-1)
    return 0.5 * (d.min(axis=1).mean() + d.min(axis=0).mean())


class Site:
    """A merged multi-clip site map in the shared wigo-world frame."""

    def __init__(self, name="site"):
        self.name = name
        self.clips = []  # (clip_path, scene, (r, t, s))
        self.instances = []  # (class_name, points [P, 3] world, clip_index)

    @classmethod
    def from_clips(cls, clip_paths, configs=None, dedupe_tol=0.5, name="site"):
        site = cls(name=name)
        configs = {**DEFAULT_CAMA_CONFIGS, **(configs or {})}
        for path in clip_paths:
            scene = compile_scene(path, configs, sources=("cama",))
            site.add_clip(path, scene)
        site.dedupe(tol=dedupe_tol)
        return site

    def add_clip(self, clip_path, scene):
        r, t, s = estimate_sim3_to_world(scene)
        ci = len(self.clips)
        self.clips.append((str(clip_path), scene, (r, t, s)))
        fp = scene.flat["cama"]
        for inst in lift.unflatten_to_instances(fp):
            world_pts = apply_sim3_points(inst["points"], r, t, s)
            self.instances.append((inst["class"], world_pts, ci))

    def dedupe(self, tol=0.5):
        """Drop map elements that duplicate an earlier clip's element of the
        same class within `tol` m symmetric chamfer distance (the intersecting
        portions shared by overlapping scenes)."""
        kept = []
        removed = 0
        for cls_name, pts, ci in self.instances:
            dup = False
            for k_cls, k_pts, k_ci in kept:
                if k_cls != cls_name or k_ci == ci:
                    continue
                # cheap bbox reject before chamfer
                lo = np.maximum(pts.min(0), k_pts.min(0))
                hi = np.minimum(pts.max(0), k_pts.max(0))
                if np.any(lo - hi > tol):
                    continue
                if chamfer_distance(pts, k_pts) < tol:
                    dup = True
                    break
            if dup:
                removed += 1
            else:
                kept.append((cls_name, pts, ci))
        self.instances = kept
        return removed

    # ---------------- outputs ----------------

    def flat_points(self, class_names=None, pad_multiple=1024):
        """Merged map as FlatPoints (device-ready, same layout the per-clip
        pipeline consumes)."""
        return lift.flatten_instances(
            [(c, p) for c, p, _ in self.instances],
            class_names=class_names, pad_multiple=pad_multiple,
        )

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
        return ClipPipeline(clip_path=path, scene=scene, chunk=chunk)

    def aggregate_lidar(self, voxel=0.2, every=2, **kw):
        """Cross-clip LiDAR aggregation: each clip's sweeps through its own
        reconstructed chain, then Sim(3) into the site frame."""
        clouds = []
        for path, scene, (r, t, s) in self.clips:
            pts = aggregate_lidar(path, pose_source="cama", every=every, **kw)
            if len(pts):
                clouds.append(apply_sim3_points(pts[:, :3], r, t, s))
        if not clouds:
            return np.zeros((0, 3), np.float32)
        merged = np.concatenate(clouds)
        if voxel:
            from cama_tpu.aggregate.lidar import voxel_downsample

            merged = voxel_downsample(merged, voxel)
        return merged


def main(argv=None):
    """Site aggregation script: merge clips covering intersecting road into
    one site map (CAMAv2 release notes, README.md:22-24)."""
    import argparse
    import os

    parser = argparse.ArgumentParser(description="CAMAv2 site-level multi-scene aggregation")
    parser.add_argument("--clips", nargs="+", required=True, help="clip directories")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--name", default="site")
    parser.add_argument("--dedupe-tol", type=float, default=0.5)
    parser.add_argument("--lidar", action="store_true", help="also aggregate LiDAR")
    parser.add_argument("--lidar-voxel", type=float, default=0.2)
    args = parser.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    site = Site.from_clips(args.clips, dedupe_tol=args.dedupe_tol, name=args.name)
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
