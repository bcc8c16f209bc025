from .logging import MetricsLogger  # noqa: F401
from .checkpoint import save_pytree, load_pytree  # noqa: F401
