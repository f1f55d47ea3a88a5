from .engine import VampEngine, VampRequest  # noqa: F401
from .webapp import make_server  # noqa: F401
