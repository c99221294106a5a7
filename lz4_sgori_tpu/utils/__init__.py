from . import oracle, stats  # noqa: F401
