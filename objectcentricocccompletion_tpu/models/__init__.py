from .ococcnet import OcOccNet, OcOccNetWithLoss, TrackletBatch  # noqa: F401
