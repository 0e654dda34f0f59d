from . import adam, init  # noqa: F401
