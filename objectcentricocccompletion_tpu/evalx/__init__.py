from . import occ_iou, waymo_bin  # noqa: F401
