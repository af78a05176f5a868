from .numeric import dec, dbl  # noqa: F401
from .vectors import cosine_similarity_expr, dot_product_expr  # noqa: F401
