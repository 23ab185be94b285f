from semiuhpe_tpu.data.loader import Loader, cycle  # noqa: F401
