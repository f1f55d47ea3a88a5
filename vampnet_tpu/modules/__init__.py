from .activations import gated_gelu, get_activation, new_gelu, snake  # noqa: F401
from .transformer import VampNetLM, LMConfig  # noqa: F401
from .layers import CodebookEmbedding  # noqa: F401
