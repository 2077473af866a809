"""Streaming video output (reference: cama/tools.py:12-40).

Backend order: ffmpeg subprocess raw-BGR pipe (reference-identical encoding
settings: 10 fps, yuv420p, libx264) -> cv2.VideoWriter -> raw .npy frame dir.
The environment may lack ffmpeg entirely, so every backend is feature-gated.
"""
from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

CAMERA_GRID = [
    ["camera_front_left", "camera_front", "camera_front_right"],
    ["camera_rear_left", "camera_rear", "camera_rear_right"],
]


def concat_camera_grid(image_dict, out=None):
    """3x2 camera mosaic (cama/tools.py:22-25).

    Implemented as slot assignments into one preallocated buffer:
    np.concatenate measures ~250 ms for this 9.3 MB mosaic on the throttled
    bench host vs ~2 ms for slot fills.  Pass `out` to reuse the buffer
    across frames."""
    h, w = next(iter(image_dict.values())).shape[:2]
    if out is None or out.shape != (h * 2, w * 3, 3):
        out = np.empty((h * 2, w * 3, 3), np.uint8)
    for r, row in enumerate(CAMERA_GRID):
        for c, cam in enumerate(row):
            out[r * h:(r + 1) * h, c * w:(c + 1) * w] = image_dict[cam]
    return out


class VideoSink:
    def __init__(self, output_path, output_shape=(2880, 1080), fps=10, preset=None):
        """preset: optional libx264 preset (e.g. 'ultrafast', 'veryfast').
        None keeps the encoder's default — byte-parity with the reference's
        settings (cama/tools.py:13-17). x264 at 2880x1080 dominates video
        writing on a 1-core host, so 'ultrafast' is a ~3-5x knob when output
        bitrate parity does not matter (config key: video_preset)."""
        self.output_path = str(output_path)
        self.output_shape = tuple(output_shape)  # (w, h)
        self.fps = fps
        self.preset = preset
        self._proc = None
        self._writer = None
        self._frames_dir = None
        self._count = 0
        self.backend = self._open()

    def _open(self):
        w, h = self.output_shape
        if shutil.which("ffmpeg"):
            preset_args = ["-preset", self.preset] if self.preset else []
            self._proc = subprocess.Popen(
                [
                    "ffmpeg", "-y", "-loglevel", "quiet",
                    "-f", "rawvideo", "-pix_fmt", "bgr24", "-s", f"{w}x{h}",
                    # input framerate must be declared or ffmpeg assumes 25
                    # fps and the output -r resamples away ~60% of the frames
                    "-framerate", str(self.fps),
                    "-i", "pipe:",
                    "-r", str(self.fps), "-pix_fmt", "yuv420p", "-vcodec", "libx264",
                    *preset_args,
                    self.output_path,
                ],
                stdin=subprocess.PIPE,
            )
            return "ffmpeg"
        try:
            import cv2

            fourcc = cv2.VideoWriter_fourcc(*"mp4v")
            self._writer = cv2.VideoWriter(self.output_path, fourcc, self.fps, (w, h))
            if self._writer.isOpened():
                return "cv2"
            self._writer = None
        except ImportError:
            pass
        self._frames_dir = self.output_path + ".frames"
        os.makedirs(self._frames_dir, exist_ok=True)
        return "raw"

    def add_frame(self, image_bgr):
        # no-copy when already uint8 C-contiguous (astype unconditionally
        # copies and costs ~100 ms for a mosaic frame on the bench host)
        img = np.ascontiguousarray(image_bgr, dtype=np.uint8)
        w, h = self.output_shape
        if img.shape != (h, w, 3):
            # a mismatched frame would silently desynchronize the raw-BGR
            # pipe (ffmpeg reads fixed-size frames) — fail loudly instead
            raise ValueError(
                f"frame shape {img.shape} != sink shape {(h, w, 3)}")
        if self._proc is not None:
            # ndarray exposes the buffer protocol: zero-copy write (tobytes
            # would materialize another ~9 MB copy per mosaic frame)
            self._proc.stdin.write(img)
        elif self._writer is not None:
            self._writer.write(img)
        else:
            np.save(os.path.join(self._frames_dir, f"{self._count:06d}.npy"), img)
        self._count += 1

    def add_frame_from_dict(self, image_dict):
        # reuse one mosaic buffer across frames (the pipe write is
        # synchronous, so the buffer is free again by the next call)
        self._mosaic = concat_camera_grid(image_dict,
                                          out=getattr(self, "_mosaic", None))
        self.add_frame(self._mosaic)

    def close(self):
        if self._proc is not None:
            self._proc.stdin.close()
            self._proc.wait()
            self._proc = None
        if self._writer is not None:
            self._writer.release()
            self._writer = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # reference parity (cama/tools.py:38-40)
        try:
            self.close()
        except Exception:
            pass
