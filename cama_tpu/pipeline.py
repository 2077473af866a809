"""Per-clip orchestration: the TPU-native replacement for the reference's
ClipManager frame loop (cama/dataset.py:11-126).

Where the reference seeks one pose, transforms each instance dict, and draws
circles per point with OpenCV — per frame, per camera, in Python — this
pipeline:

  1. compiles the scene once (cama_tpu.io.scene) into flat point tensors,
  2. composes all per-frame matrices on host in float64 (tiny),
  3. runs a single jitted chunked device program per batch of frames that
     projects every point into all 6 cameras and rasterizes overlay class
     rasters with deterministic paint order,
  4. streams compact uint8 class rasters back to host, where cached-remap
     undistorted JPEGs are composited and written to video.

The reference's per-frame undistort-map recomputation (cama/reproject.py:238)
is replaced by a once-per-camera RemapCache.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from cama_tpu.io.scene import DEFAULT_CAMA_CONFIGS, Scene, compile_scene
from cama_tpu.io.video import VideoSink, concat_camera_grid
from cama_tpu.ops.geometry import compose_frame_matrices, crop_bounds, project_frames
from cama_tpu.ops.raster import MAX_CLS, build_color_table, packed_to_cls, rasterize_packed
from cama_tpu.ops.undistort import RemapCache, remap_host

_P = jax.lax.Precision.HIGHEST


@partial(jax.jit, static_argnames=("width", "height"))
def _overlay_chunk(points, valid, cls, A, B, frame_valid, crop_lo, crop_hi, width, height):
    """One chunk of frames -> uint8 class rasters [chunk, C, H, W].

    Frames are mapped sequentially (lax.map) so peak memory stays at one
    frame's working set; cameras within a frame are vmapped.
    """

    def per_frame(args):
        Af, Bf, fv = args
        vu, keep = project_frames(
            points, valid, Af[None], Bf[None], fv[None], width, height, crop_lo, crop_hi
        )
        packed = rasterize_packed(vu[0], keep[0], cls, width, height)  # [C, H, W]
        return packed_to_cls(packed)

    return jax.lax.map(per_frame, (A, B, frame_valid))


@partial(jax.jit, static_argnames=("width", "height"))
def _project_chunk(points, valid, A, B, frame_valid, crop_lo, crop_hi, width, height):
    return project_frames(points, valid, A, B, frame_valid, width, height, crop_lo, crop_hi)


class ClipPipeline:
    def __init__(self, configs=None, clip_path=None, sources=("cama", "nuscenes"),
                 chunk=8, scene: Scene = None):
        self.configs = {**DEFAULT_CAMA_CONFIGS, **(configs or {})}
        self.chunk = int(chunk)
        self.scene = scene if scene is not None else compile_scene(
            clip_path, self.configs, sources=sources
        )
        self.remaps = RemapCache()
        self._fm = {}
        self._dev = {}
        h, w = self.scene.output_size
        self._crop_lo, self._crop_hi = crop_bounds()
        self._color_tables = {
            src: build_color_table(self.scene.flat[src].class_names)
            for src in self.scene.flat
        }

    # ---------------- cached per-source state ----------------

    def frame_matrices(self, source, t_max_diff=0.5):
        if source not in self._fm:
            self._fm[source] = compose_frame_matrices(
                self.scene.traj[source],
                self.scene.frame_times,
                self.scene.chassis2cam,
                self.scene.K_scaled,
                t_max_diff=t_max_diff,
            )
        return self._fm[source]

    def device_points(self, source):
        if source not in self._dev:
            self._dev[source] = self.scene.device_points(source)
        return self._dev[source]

    def _chunked_AB(self, source):
        fm = self.frame_matrices(source)
        F = len(fm.frame_indices)
        pad = (-F) % self.chunk
        A = np.concatenate([fm.A, np.tile(np.eye(4), (pad, 1, 1))]).astype(np.float32)
        B = np.concatenate([fm.B, np.zeros((pad,) + fm.B.shape[1:])]).astype(np.float32)
        fv = np.concatenate([fm.frame_valid, np.zeros(pad, bool)])
        return fm, A, B, fv, F

    # ---------------- device passes ----------------

    def iter_overlay_rasters(self, source):
        """Yield (image_idx, cls_raster [C, H, W] uint8 on host) per valid
        frame, computed chunk-by-chunk on device."""
        fm, A, B, fv, F = self._chunked_AB(source)
        points, cls, valid = self.device_points(source)
        h, w = self.scene.output_size
        for s in range(0, len(fv), self.chunk):
            sl = slice(s, s + self.chunk)
            rasters = _overlay_chunk(
                points, valid, cls,
                jnp.asarray(A[sl]), jnp.asarray(B[sl]), jnp.asarray(fv[sl]),
                self._crop_lo, self._crop_hi, w, h,
            )
            rasters = np.asarray(rasters)  # [chunk, C, H, W] uint8
            for k in range(rasters.shape[0]):
                fidx = s + k
                if fidx >= F or not fm.frame_valid[fidx]:
                    continue
                yield int(fm.frame_indices[fidx]), rasters[k]

    def project_source(self, source):
        """All frames' (vu, keep) as device arrays (for metrics / export).
        Memory: F*C*P — use only when that fits; otherwise chunk manually."""
        fm, A, B, fv, F = self._chunked_AB(source)
        points, cls, valid = self.device_points(source)
        h, w = self.scene.output_size
        vu, keep = _project_chunk(
            points, valid, jnp.asarray(A), jnp.asarray(B), jnp.asarray(fv),
            self._crop_lo, self._crop_hi, w, h,
        )
        return fm, vu[:F], keep[:F]

    # ---------------- host compositing ----------------

    def undistorted_image(self, camera, image_idx):
        import cv2

        c = self.scene.camera_list.index(camera)
        h, w = self.scene.output_size
        mapx, mapy = self.remaps.get(
            camera, self.scene.K_orig[c], self.scene.d[c], self.scene.K_scaled[c], (h, w)
        )
        img = cv2.imread(self.scene.image_path(camera, image_idx))
        return remap_host(img, mapx, mapy)

    def composite_frame(self, source, image_idx, cls_raster):
        """cls_raster [C, H, W] uint8 -> {camera: overlay image} (host)."""
        table = self._color_tables[source]
        out = {}
        for c, camera in enumerate(self.scene.camera_list):
            img = self.undistorted_image(camera, image_idx)
            r = cls_raster[c]
            painted = r > 0
            img[painted] = table[(r[painted] - 1) % MAX_CLS]
            out[camera] = img
        return out

    def iter_frames(self, source):
        """Reference yield_frame + project_all_camera + render_vectors
        equivalent: yields (image_idx, {camera: overlay image})."""
        for image_idx, raster in self.iter_overlay_rasters(source):
            yield image_idx, self.composite_frame(source, image_idx, raster)

    def write_video(self, source, output_path, fps=10):
        h, w = self.scene.output_size
        n = 0
        with VideoSink(output_path, output_shape=(w * 3, h * 2), fps=fps) as sink:
            for _, images in self.iter_frames(source):
                sink.add_frame(concat_camera_grid(images))
                n += 1
        return n
