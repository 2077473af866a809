"""cama_tpu — a TPU-native (JAX/XLA/Pallas) rebuild of the CAMA map-annotation
framework (reference: manymuch/CAMA, mounted at /root/reference).

The reference is a single-threaded NumPy/OpenCV pipeline; this framework
re-designs it around fixed-shape, mask-carried tensors so every per-frame
stage (SE(3) pose interpolation, world->chassis->camera transforms, crop,
pinhole projection, overlay rasterization, map metrics) is jittable and
shardable over a `jax.sharding.Mesh`.

Layer map (mirrors reference SURVEY.md §1):
  se3/        pose algebra + trajectory container   (ref: cama/pose_transformer.py)
  io/         clip on-disk format reader + scene compiler + fixtures
                                                    (ref: cama/dataset_reader.py)
  ops/        lifting, geometry pipeline, rasterizer, undistort, pallas kernels
                                                    (ref: cama/reproject.py)
  pipeline    per-clip orchestration                (ref: cama/dataset.py)
  eval/       KITTI-style pose metrics + CAMAv2 map metrics
                                                    (ref: cama/pose_evaluator.py)
  convert/    nuScenes -> clip conversion           (ref: dataset/nuscenes2clip.py)
  aggregate/  CAMAv2 site + LiDAR aggregation       (ref: README.md release notes)
  parallel/   mesh / shard_map scale-out            (no reference analogue)
"""

__version__ = "0.1.0"
