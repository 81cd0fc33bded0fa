from . import (cluster, incremental, masked, pointnet, roi_pool,  # noqa
               sparse_conv, voxelize, window)
