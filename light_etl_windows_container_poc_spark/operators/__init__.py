from . import cleaning, quality, routing  # noqa: F401
