from . import masked, roi_pool  # noqa: F401
