from cama_tpu.eval.pose_metrics import PoseEvaluator

__all__ = ["PoseEvaluator"]
