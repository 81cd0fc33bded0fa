from . import (evaluator, kitti_eval, occ_iou, online_tuning, tta,  # noqa
               waymo_bin, waymo_metrics)
