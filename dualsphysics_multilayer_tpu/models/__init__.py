from . import wcsph, cases  # noqa: F401
