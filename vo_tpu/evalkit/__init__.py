from vo_tpu.evalkit.kitti import KittiOdomEvaluator, EvalResult
