from . import gcn  # noqa: F401
