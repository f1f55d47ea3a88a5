from .attention import dot_product_attention  # noqa: F401
