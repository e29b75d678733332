from . import texts, vectors  # noqa: F401
