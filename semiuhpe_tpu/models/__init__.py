from semiuhpe_tpu.models.registry import build_network, BACKBONES  # noqa: F401
