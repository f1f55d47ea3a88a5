from .engine import VampEngine, VampRequest  # noqa: F401
