"""LiDAR point aggregation with reconstructed poses (reference README 2.1.0
release note — code absent from the snapshot, SURVEY.md §2.3; built here from
the primitives that exist: ClipReader.iter_lidar + pose chains + the
save_pcd/save_xyz output paths of cama/reproject.py:133-160).

TPU-native shape: lidar frames are padded into one [F, N, 4] tensor, poses
composed on host (float64) into T_world<-lidar [F, 4, 4], and the transform +
voxel dedup run as one device program (einsum + sort-based unique)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from cama_tpu.io.clip import ClipReader
from cama_tpu.io.scene import DEFAULT_CAMA_CONFIGS, build_chassis_trajectory
from cama_tpu.se3.trajectory import apply_seek, seek_indices

_P = jax.lax.Precision.HIGHEST

# 'auto' backend cutoff (padded points, F*N): below this the one-core CPU
# einsum runs in milliseconds, so the in-process CPU device wins outright
# against a fresh remote compile of the accelerator program (RTT-dominated,
# minutes in slow service phases — same measured rationale as
# site.HOST_CHAMFER_MAX_PAIRS); above it the device compile amortizes
HOST_TRANSFORM_MAX_POINTS = 4_000_000


@jax.jit
def _transform_points(T, pts, valid):
    """[F, 4, 4] x [F, N, 3] -> flat world points (masked).
    Returns [F, N, 3] world coords."""
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    out = jnp.einsum("fij,fnj->fni", T[:, :3, :], ph, precision=_P)
    return jnp.where(valid[..., None], out, jnp.nan)


def _transform_points_host(T, pts, valid):
    """NumPy f32 mirror of _transform_points — the 'host' backend.  Pure
    NumPy on purpose: pinning to the in-process CPU *jax* device still
    blocks on jax's global backend lock whenever the process's first
    accelerator touch is mid-flight (the tunneled client creation runs
    under that lock and takes minutes in slow service phases — observed
    live: a backgrounded kernel warm froze `jax.local_devices('cpu')` for
    25+ minutes).  Same f32 dtype discipline as the device program; the
    4-term contraction differs from XLA only in rounding order (~1 ulp)."""
    ph = np.concatenate([pts, np.ones_like(pts[..., :1])], axis=-1)
    out = np.einsum("fij,fnj->fni", T[:, :3, :].astype(np.float32), ph,
                    dtype=np.float32)
    return np.where(valid[..., None], out, np.float32(np.nan))


def voxel_downsample(points, voxel):
    """Keep one point per voxel (first in input order). Host NumPy: 64-bit
    voxel keys don't survive JAX's default 32-bit ints, and aggregation is an
    I/O-bound batch job anyway."""
    pts = np.asarray(points)
    # quantize in float64: UTM-scale inputs cast to f32 would alias voxels
    # (f32 spacing ~0.5 m at 1e6 m exceeds typical voxel sizes)
    q = np.floor(pts.astype(np.float64) / voxel).astype(np.int64)
    _, first_idx = np.unique(q, axis=0, return_index=True)
    return pts[np.sort(first_idx)]


def aggregate_lidar(clip_path, pose_source="cama", configs=None, voxel=None,
                    every=1, t_max_diff=0.5, deskewed=False, max_frames=None,
                    with_intensity=False, backend="auto"):
    """Aggregate a clip's LiDAR sweeps into one world-frame cloud.

    Args:
        pose_source: 'cama' (SfM reconstructed chain — the CAMAv2 demo),
                     'wigo' (raw ego odometry, UTM frame), or 'wigo_offset'.
        voxel: optional voxel size in meters for downsampling.
        every: take every k-th sweep.
        backend: 'device' jits the transform for the default accelerator;
                 'host' runs the pure-NumPy f32 mirror — no jax at all, so
                 it can never wait on a remote compile OR on jax's backend
                 lock during the accelerator client's (minutes-slow,
                 tunneled) first initialization; 'auto' (default) picks
                 'host' for small clouds (padded points <=
                 HOST_TRANSFORM_MAX_POINTS) or while a background kernel
                 warm is compiling.
    Returns [N, 3] float32 world points (or [N, 4] with intensity).
    """
    if backend not in ("auto", "host", "device"):
        raise ValueError(f"aggregate_lidar backend {backend!r} "
                         "not in ('auto', 'host', 'device')")
    configs = {**DEFAULT_CAMA_CONFIGS, **(configs or {})}
    reader = ClipReader(clip_path)
    traj = build_chassis_trajectory(reader, pose_source, configs)
    T_lidar2chassis = reader.extrinsic("lidar_top", "chassis")

    frames, times = [], []
    for i, (ts, pc) in enumerate(reader.iter_lidar(deskewed=deskewed)):
        if i % every:
            continue
        frames.append(pc)
        times.append(ts)
        if max_frames and len(frames) >= max_frames:
            break
    if not frames:
        return np.zeros((0, 3), np.float32)

    idx = seek_indices(traj.timestamps[:, 0], np.asarray(times), t_max_diff, interpolate=True)
    chassis2world = apply_seek(traj.as_transform(True), idx)
    ok = idx["valid"]
    T = (chassis2world @ T_lidar2chassis)[ok]
    frames = [f for f, o in zip(frames, ok) if o]
    if not frames:
        return np.zeros((0, 3), np.float32)

    n_max = max(len(f) for f in frames)
    F = len(frames)
    pts = np.zeros((F, n_max, 3), np.float32)
    inten = np.zeros((F, n_max), np.float32)
    valid = np.zeros((F, n_max), bool)
    for i, f in enumerate(frames):
        pts[i, : len(f)] = f[:, :3]
        inten[i, : len(f)] = f[:, 3] if f.shape[1] > 3 else 0
        valid[i, : len(f)] = True

    # recenter before the float32 device transform: 'wigo' poses live in a
    # global/UTM frame where |t| ~ 1e5-1e6 m would crush world-point precision
    # to centimeters in f32; subtracting the mean translation keeps everything
    # near the origin, and it is added back in float64 afterwards
    center = T[:, :3, 3].mean(axis=0)
    T_local = T.copy()
    T_local[:, :3, 3] -= center
    if backend == "auto":
        from cama_tpu.pipeline import warms_in_flight

        backend = ("host" if pts.size // 3 <= HOST_TRANSFORM_MAX_POINTS
                   or warms_in_flight() else "device")
    if backend == "host":
        world = _transform_points_host(
            T_local.astype(np.float32), pts, valid
        ).astype(np.float64) + center
    else:
        world = np.asarray(_transform_points(
            jnp.asarray(T_local, dtype=jnp.float32), jnp.asarray(pts),
            jnp.asarray(valid)
        ), dtype=np.float64) + center
    flat = world.reshape(-1, 3)
    keep = ~np.isnan(flat[:, 0])
    out = flat[keep]
    inten_flat = inten.reshape(-1)[keep]
    if voxel:
        out = voxel_downsample(out, voxel)
        with_intensity = False  # intensity dropped by dedup
    if with_intensity:
        return np.concatenate([out, inten_flat[:, None]], axis=1)
    return out


def save_pcd(path, points, colors=None):
    """Write an ASCII PCD v0.7 (open3d-free replacement for the reference's
    save_pcd, cama/reproject.py:133-151).

    float64 inputs are written as SIZE 8 doubles: site/LiDAR points are
    UTM-scale world coordinates, where a float32 cast quantizes by ~0.5 m —
    the very precision the pipeline's f64 recentering protects."""
    points = np.asarray(points)
    f64 = points.dtype == np.float64
    points = points.astype(np.float64 if f64 else np.float32)
    fsz = "8" if f64 else "4"
    n = len(points)
    with open(path, "w") as f:
        fields = "x y z" + (" rgb" if colors is not None else "")
        sizes = f"{fsz} {fsz} {fsz}" + (" 4" if colors is not None else "")
        types = "F F F" + (" U" if colors is not None else "")
        counts = "1 1 1" + (" 1" if colors is not None else "")
        f.write(
            "# .PCD v0.7 - Point Cloud Data file format\n"
            f"VERSION 0.7\nFIELDS {fields}\nSIZE {sizes}\nTYPE {types}\n"
            f"COUNT {counts}\nWIDTH {n}\nHEIGHT 1\n"
            "VIEWPOINT 0 0 0 1 0 0 0\n"
            f"POINTS {n}\nDATA ascii\n"
        )
        if colors is not None:
            colors = np.asarray(colors, dtype=np.uint32)
            rgb = (colors[:, 0] << 16) | (colors[:, 1] << 8) | colors[:, 2]
            for (x, y, z), c in zip(points, rgb):
                f.write(f"{x:.6f} {y:.6f} {z:.6f} {c}\n")
        else:
            for x, y, z in points:
                f.write(f"{x:.6f} {y:.6f} {z:.6f}\n")
    return path


def save_xyz(path, points):
    """%.3f xyz text (reference save_xyz, cama/reproject.py:153-160)."""
    np.savetxt(path, np.asarray(points)[:, :3], fmt="%.3f")
    return path


def main(argv=None):
    """LiDAR aggregation demo script (CAMAv2 release notes, README.md:21)."""
    import argparse

    parser = argparse.ArgumentParser(
        description="Aggregate a clip's LiDAR sweeps with reconstructed poses"
    )
    parser.add_argument("--clip", required=True)
    parser.add_argument("--out", required=True, help=".pcd or .xyz output path")
    parser.add_argument("--pose-source", default="cama",
                        choices=["cama", "wigo", "wigo_offset"])
    parser.add_argument("--voxel", type=float, default=None)
    parser.add_argument("--every", type=int, default=1)
    parser.add_argument("--deskewed", action="store_true")
    parser.add_argument("--backend", default="auto",
                        choices=["auto", "host", "device"],
                        help="'host' runs the pure-NumPy transform mirror "
                             "(no accelerator, no compile wait); 'auto' "
                             "picks by cloud size")
    args = parser.parse_args(argv)

    pts = aggregate_lidar(args.clip, pose_source=args.pose_source, voxel=args.voxel,
                          every=args.every, deskewed=args.deskewed,
                          backend=args.backend)
    if args.out.endswith(".xyz"):
        save_xyz(args.out, pts)
    else:
        save_pcd(args.out, pts)
    print(f"{len(pts)} points -> {args.out}")


if __name__ == "__main__":
    main()
