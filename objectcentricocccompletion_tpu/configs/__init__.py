from .ococcnet_config import OcOccNetConfig, tiny_config  # noqa: F401
