from .sample import (  # noqa: F401
    mask_by_random_topk,
    sample_from_logits,
    typical_filter,
)
from .generate import generate, build_generate_fn  # noqa: F401
