from semiuhpe_tpu.render.renderer import Renderer  # noqa: F401
from semiuhpe_tpu.render.lighting import RenderPipeline  # noqa: F401
